"""Reusable similarity-search operators over embedding DataFrames — the
engine API behind the knn/ann gate queries.

Scoring stays in whole-stage codegen (unrolled multiply-add chains when
`dim` is given — see functions.vectors); the query set is broadcast so the
collection side never shuffles; rank keys are rounded with an id tie-break
for determinism (see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import as_double, dot, hyperplane_bits, make_planes, norm_sq


def _with_norms(df: DataFrame, id_col: str, vec_col: str, dim: int | None) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), as_double(vec_col).alias("emb")
    ).withColumn("n2", norm_sq(F.col("emb"), dim))


def knn_topk(
    collection: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_digits: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k of each query against the collection (broadcast
    query set, map-only scan of the collection)."""
    coll = _with_norms(collection, id_col, vec_col, dim)
    q = _with_norms(queries, id_col, vec_col, dim).select(
        F.col("id").alias("query_id"), F.col("emb").alias("qemb"), F.col("n2").alias("qn2")
    )
    pairs = coll.join(F.broadcast(q), F.col("id") != F.col("query_id")).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(dot(F.col("qemb"), F.col("emb"), dim) / F.sqrt(F.col("qn2") * F.col("n2")), round_digits).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ann_topk(
    collection: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH buckets: candidates share
    the query's bucket (equality join replaces the scan), exact cosine
    re-rank. Integer plane weights make bucket bits exact-arithmetic."""
    planes = make_planes(n_planes, dim)
    coll = _with_norms(collection, id_col, vec_col, dim).withColumn(
        "bucket", hyperplane_bits(F.col("emb"), planes)
    )
    q = _with_norms(queries, id_col, vec_col, dim).withColumn(
        "bucket", hyperplane_bits(F.col("emb"), planes)
    ).select(
        F.col("id").alias("query_id"), F.col("emb").alias("qemb"),
        F.col("n2").alias("qn2"), "bucket",
    )
    pairs = coll.join(F.broadcast(q), ["bucket"]).filter(F.col("id") != F.col("query_id")).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(dot(F.col("qemb"), F.col("emb"), dim) / F.sqrt(F.col("qn2") * F.col("n2")), round_digits).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _table_buckets_pandas(df, tables):
    """(id, emb) → one row per (id, table, bucket) via Arrow-batched numpy —
    the many-plane regime where L×b HOF dot expressions are all interpreted
    CodegenFallback (measured: 8 tables × 6 planes as Column expressions
    cost ~7 s/query at sf0.1; this path well under 1 s).

    PARITY-CRITICAL float discipline: the accumulation loops over the dim
    axis IN ORDER with one vectorized add per element, which reproduces the
    scalar left-to-right IEEE rounding of the Column/oracle form exactly —
    a BLAS matmul's pairwise summation would differ in the last ulp and
    could flip a bucket bit where a plane dot lands within rounding of 0.
    Zero-weight terms are skipped (adding exact ±0.0 never changes the sum
    or the >= 0 test — same argument as hyperplane_bits(unroll=True))."""
    import numpy as np
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(tables)
    n_tables = len(tables)
    schema = "id long, t int, bucket long"

    def bucket_batches(it):
        tbls = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            emb = np.array(pdf["emb"].tolist(), dtype=np.float64)  # (n, d)
            n = len(pdf)
            buckets = np.zeros((n, n_tables), dtype=np.int64)
            for t, planes in enumerate(tbls):
                for j, w in enumerate(planes):
                    acc = np.zeros(n, dtype=np.float64)
                    for i, x in enumerate(w):
                        if x:
                            acc = acc + emb[:, i] * float(x)
                    buckets[:, t] += (acc >= 0).astype(np.int64) << j
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), n_tables),
                    "t": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select("id", "emb").mapInPandas(bucket_batches, schema=schema)


def ann_topk_multitable(
    collection: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_tables: int = 4,
    n_planes: int = 8,
    dim: int = 64,
    round_digits: int = 4,
    unroll_dim: int | None = None,
) -> DataFrame:
    """Multi-table LSH ANN (OR-amplification): L independent hyperplane
    tables; a candidate only needs to collide with the query in ONE table.
    Single-table LSH AND-amplifies (all n_planes bits must agree), whose
    recall collapses when true neighbors aren't extremely close — multiple
    tables trade a bounded candidate-set growth (≤ L×) for multiplicatively
    better recall: miss probability (1 - p^b)^L drops geometrically in L.

    Scale shape: each side expands to L (table, bucket) keys (Arrow-batched
    bit computation, _table_buckets_pandas) — the join stays an EQUI join
    on (table, bucket) with an L× larger but perfectly partitionable key
    space; candidate pairs are deduped BEFORE the exact re-rank so each
    survivor is scored once.

    ``dim`` is the true vector dimension (sizes the hyperplanes);
    ``unroll_dim`` separately picks the SCORING expression form — None
    keeps the HOF dot (small expression tree, compile-cheap: right when
    candidate counts are modest), ``=dim`` emits unrolled multiply-add
    chains (codegen-hot: right at >~10^6 scored pairs where per-row cost
    dominates compile). Values are bit-identical either way."""
    tables = [make_planes(n_planes, dim, seed=t) for t in range(n_tables)]
    coll = _with_norms(collection, id_col, vec_col, unroll_dim)
    q = _with_norms(queries, id_col, vec_col, unroll_dim).select(
        F.col("id").alias("query_id"), F.col("emb").alias("qemb"), F.col("n2").alias("qn2")
    )
    # the query set is small BY CONTRACT (it broadcasts) — bucket it on the
    # driver instead of paying a Python-worker launch for ~20 rows. Plain
    # Python floats are IEEE doubles and the loop is the same left-to-right
    # order, so buckets are bit-identical to the executor/oracle forms.
    def _bits_py(vec: list[float], planes: list[list[int]]) -> int:
        bucket = 0
        for j, w in enumerate(planes):
            acc = 0.0
            for i, x in enumerate(w):
                if x:
                    acc += vec[i] * float(x)
            if acc >= 0:
                bucket += 1 << j
        return bucket

    q_rows = q.select("query_id", "qemb").collect()
    qb = collection.sparkSession.createDataFrame(
        [
            (r["query_id"], t, _bits_py(r["qemb"], tables[t]))
            for r in q_rows
            for t in range(n_tables)
        ],
        "query_id long, t int, bucket long",
    )
    cand = (
        _table_buckets_pandas(coll, tables)
        .join(F.broadcast(qb), ["t", "bucket"])
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
        .distinct()
    )
    pairs = (
        cand.join(coll.select(F.col("id").alias("neighbor_id"), "emb", "n2"), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qemb"), F.col("emb"), unroll_dim)
                / F.sqrt(F.col("qn2") * F.col("n2")),
                round_digits,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def topk_recall(
    approx: DataFrame,
    exact: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one —
    the tuning loop for n_planes/n_probe at scale: per query,
    |approx ∩ exact| / |exact| over the neighbor sets.

    Both inputs are tiny (n_queries x k rows) regardless of collection
    size, so this is a skinny equi-join + groupBy — evaluation cost never
    scales with the corpus. The ratio is integer-derived, so it's exact
    across engines (no rounding needed)."""
    a = approx.select(query_col, neighbor_col).withColumn("hit", F.lit(1))
    return (
        exact.select(query_col, neighbor_col)
        .join(a, [query_col, neighbor_col], "left")
        .groupBy(query_col)
        .agg(F.count(F.lit(1)).alias("n_exact"), F.count("hit").alias("n_hit"))
        .withColumn("recall", F.col("n_hit") / F.col("n_exact"))
    )


def stride_centroids(collection: DataFrame, id_col: str, vec_col: str, stride: int) -> DataFrame:
    """Deterministic coarse quantizer: every stride-th id is a centroid.
    SQL-expressible, so IVF queries built on it keep an exact DuckDB oracle
    (a learned k-means quantizer can't — see kmeans_centroids)."""
    return _with_norms(collection.filter(F.col(id_col) % stride == 0), id_col, vec_col, None).select(
        F.col("id").alias("cid"), F.col("emb").alias("cemb")
    )


def kmeans_centroids(
    collection: DataFrame, id_col: str, vec_col: str, k: int = 16, seed: int = 7
) -> DataFrame:
    """Learned coarse quantizer via Spark MLlib k-means (the real scale path:
    the model fits on a sample, transform is map-side). Deterministic for a
    fixed seed WITHIN Spark, but not SQL-expressible — operator tests only."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.types import DoubleType

    vecs = collection.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, seed=seed).fit(vecs)
    centers = [c.tolist() for c in model.clusterCenters()]
    spark = collection.sparkSession
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)], ["cid", "cemb"]
    ).withColumn("cemb", F.col("cemb").cast("array<double>"))


def ivf_topk(
    collection: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_probe: int = 3,
    round_digits: int = 4,
    dim: int | None = None,
    assign: str = "expr",
) -> DataFrame:
    """IVF approximate top-k: assign every vector to its nearest centroid
    (inverted lists), probe each query's n_probe nearest cells, exact cosine
    re-rank inside the probed cells.

    Scale shape: centroids broadcast to both sides; the N x K assignment
    reduces map-side via partial min(struct) aggregation, so the only big
    shuffle is the groupBy(id) argmin carrying one row per (vector x K) pair
    pre-combined to one per vector per partition. Candidates join on cell id
    (equi-join). argmin uses d = |c|^2 - 2 e.c (the |e|^2 term is constant
    per vector, dropped on BOTH engines) with a centroid-id tie-break.

    assign= picks the N x K assignment strategy (measured at 60k x 480 on
    local[32]):
      "expr"  — pure Column expressions, engine-exact (DuckDB-oracle-safe).
                HOF dot (dim=None) 215 s; unrolled (dim=64) 47 s.
      "numpy" — Arrow-batched mapInPandas, one (batch x dim)@(dim x K)
                matmul per batch, no join at all: 4 s. BLAS pairwise
                summation differs from sequential float order in the last
                ulp, so cell choice can flip where two centroids are
                near-equidistant — fine for real ANN deployments, not for
                exact cross-engine parity."""
    coll = _with_norms(collection, id_col, vec_col, dim)
    # |c|^2 once per centroid, not per pair — same float as the oracle's
    # per-pair list_dot_product(cemb, cemb), so parity is unaffected
    cent = F.broadcast(centroids.withColumn("cn2", dot(F.col("cemb"), F.col("cemb"), dim)))

    def _d(emb: Column) -> Column:
        # d = |c|^2 - 2 e.c, written exactly as the DuckDB oracle writes it
        return F.col("cn2") - F.lit(2.0) * dot(emb, F.col("cemb"), dim)

    if assign == "numpy":
        assign_df = _assign_numpy(coll, centroids)
    else:
        assign_df = (
            coll.crossJoin(cent)
            .groupBy("id")
            .agg(
                F.min(F.struct(_d(F.col("emb")).alias("d"), F.col("cid").alias("cid"))).alias("m"),
                F.first("emb").alias("emb"),
                F.first("n2").alias("n2"),
            )
            .select("id", "emb", "n2", F.col("m.cid").alias("cid"))
        )
    q = _with_norms(queries, id_col, vec_col, dim).select(
        F.col("id").alias("query_id"), F.col("emb").alias("qemb"), F.col("n2").alias("qn2")
    )
    qd = q.crossJoin(cent).select(
        "query_id", "qemb", "qn2", "cid", _d(F.col("qemb")).alias("d")
    )
    wp = Window.partitionBy("query_id").orderBy("d", "cid")
    probe = qd.withColumn("rn", F.row_number().over(wp)).filter(F.col("rn") <= n_probe).select(
        "query_id", "qemb", "qn2", "cid"
    )
    pairs = assign_df.join(F.broadcast(probe), ["cid"]).filter(F.col("id") != F.col("query_id")).select(
        "query_id",
        F.col("id").alias("neighbor_id"),
        F.round(
            dot(F.col("qemb"), F.col("emb"), dim) / F.sqrt(F.col("qn2") * F.col("n2")), round_digits
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _assign_numpy(coll: DataFrame, centroids: DataFrame) -> DataFrame:
    """Vectorized cell assignment: centroid matrix to every executor via a
    broadcast variable, argmin over one BLAS matmul per Arrow batch. This is
    the only similarity stage where built-in expressions genuinely can't
    keep up (interpreted HOF per pair vs one matmul per batch, ~70x)."""
    import numpy as np

    spark = coll.sparkSession
    cent_rows = centroids.orderBy("cid").collect()  # K x dim, K is small
    cids = np.array([r["cid"] for r in cent_rows], dtype=np.int64)
    cmat = np.array([r["cemb"] for r in cent_rows], dtype=np.float64)  # (K, d)
    cnorm = (cmat * cmat).sum(axis=1)  # |c|^2, (K,)
    bc = spark.sparkContext.broadcast((cids, cmat, cnorm))

    schema = "id long, emb array<double>, n2 double, cid long"

    def assign_batches(it):
        b_cids, b_cmat, b_cnorm = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            emb = np.array(pdf["emb"].tolist(), dtype=np.float64)  # (n, d)
            d = b_cnorm[None, :] - 2.0 * (emb @ b_cmat.T)  # (n, K)
            pick = d.argmin(axis=1)  # ties -> lowest index == lowest cid
            out = pdf[["id", "emb", "n2"]].copy()
            out["cid"] = b_cids[pick]
            yield out

    return coll.mapInPandas(assign_batches, schema=schema)
