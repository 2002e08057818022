"""Reusable similarity-search operators over embedding DataFrames — the
engine API behind the knn/ann gate queries.

Scoring stays in whole-stage codegen (unrolled multiply-add chains when
`dim` is given — see functions.vectors); the query set is broadcast so the
collection side never shuffles; rank keys are rounded with an id tie-break
for determinism (see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
