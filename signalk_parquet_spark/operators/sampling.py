"""Deterministic corpus-shaping operators (BASELINE extension set):
stratified hash sampling and token-stream packing — the two steps between
"curated document set" and "training batches".

Both are map-side or single-window computations with NO randomness: every
decision derives from md5 of stable keys or an exact prefix sum, so reruns
(and the DuckDB oracle) reproduce bit-identical output — the property a
resumable 100 TB pipeline needs (a `rand()` sample changes under retry and
task re-execution; a hash sample does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^32 — the hash space of the 8-hex md5 prefix used for sampling
_HASH_SPACE = 1 << 32


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "aes",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006, algorithm A-ES): each row gets key u^(1/w) for a
    uniform u — equivalently ln(u)/w, maximized — and the k largest keys
    are the sample, which realizes exact sequential weighted sampling
    probabilities. ``u`` is CONTENT-HASH randomness (48-bit md5 prefix of
    id+salt mapped into (0,1)), not rand(): reruns, task retries and the
    DuckDB oracle reproduce the identical sample, and varying ``salt``
    draws independent replicates (the property Monte-Carlo ablations
    need from a resumable pipeline).

    Scale shape: map-only key computation + ORDER BY ... LIMIT k, which
    Spark executes as TakeOrderedAndProject — per-partition top-k heaps
    merged on one reducer (k rows per partition in flight), never the
    full range-exchange sort a global ORDER BY would be
    (tests/test_weighted_sample.py asserts the plan). Rows with NULL or
    non-positive weight are excluded (A-ES is defined for w > 0).

    Returns (id_col, weight_col) ordered by descending key with id ASC
    as the total-order tie-break. Cross-engine note: the key ordering
    compares ln outputs — a continuum threshold in CLAUDE.md rule-4
    terms; adjacent hash-derived keys are separated by ~range/N^2, many
    orders of magnitude above the ~1-ulp cross-libm ln disagreement, and
    the emitted columns themselves carry no floats derived from ln."""
    if k < 1:
        raise ValueError(f"sample size k must be >= 1, got {k}")
    w = F.col(weight_col)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .select(id_col, weight_col, aes_key_col(id_col, weight_col, salt).alias("_key"))
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
        .select(id_col, weight_col)
    )


def aes_key_col(id_col: str, weight_col: str, salt: str = "aes"):
    """The A-ES sampling key ln(u)/w as a Column — u is the 48-bit md5
    prefix of id+salt mapped into (0, 1) (never 0: ln; never 1: key-0
    ties). Shared by :func:`weighted_sample` and the streaming twin
    (streaming/stateful.streaming_weighted_sample) so both rank on
    BIT-IDENTICAL keys (both evaluate this same JVM expression — a
    Python math.log twin could differ by an ulp at the k boundary)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / float((1 << 48) + 1)
    return F.log(u) / F.col(weight_col)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff the 32-bit md5
    prefix of ``id|stratum`` falls below floor(rate * 2^32) for its stratum
    — the language/domain re-balancing step of a training-data mix (e.g.
    downweight an over-represented language without touching the rest).

    Map-only (no shuffle, no state); the threshold compare is pure integer
    arithmetic, so Spark and any other md5-capable engine agree exactly.
    Returns the input ids with (stratum, kept) — callers filter on ``kept``
    so the decision can also be audited/joined rather than applied blindly.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|"), F.col(strata_col))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    thr = None
    for stratum, rate in sorted(rates.items()):
        t = F.when(F.col(strata_col) == stratum, F.lit(int(rate * _HASH_SPACE)))
        thr = t if thr is None else thr.when(
            F.col(strata_col) == stratum, F.lit(int(rate * _HASH_SPACE))
        )
    thr = (
        thr.otherwise(F.lit(int(default_rate * _HASH_SPACE)))
        if thr is not None
        else F.lit(int(default_rate * _HASH_SPACE))
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.col(strata_col).alias("stratum"),
        (h < thr).alias("kept"),
    )


def cluster_quota_sample(
    collection: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    quota: int,
    dim: int | None = None,
) -> DataFrame:
    """Cluster-balanced subsampling over an embedding column: assign every
    vector to its nearest centroid cell (map-only — centroids inline as
    broadcast literals under the similarity family's bounded_collect
    contract), rank within each cell by (distance-to-centroid asc, id), and
    keep the ``quota`` most-central per cell. This is the data-BALANCING
    step of an embedding-curated corpus (cap every semantic region at the
    same budget so oversampled regions stop dominating the mix) — the
    complement of SemDeDup, which removes near-DUPLICATES within a cell
    rather than capping the cell.

    Scale: one shuffle, partitioned by cell id — parallelism is the cell
    count (K ≈ √N by the IVF sizing contract) and each window holds one
    cell, never the corpus. The rank is a plain row_number, so with a
    WHERE rank <= quota on top Spark plans a WindowGroupLimit: partial
    top-``quota`` per map task BEFORE the exchange, so the shuffle carries
    at most quota·K·tasks rows, not N. Distances use the shared
    _cell_dist_structs construction (sequential IEEE order, (d, id) tie
    order), so an oracle computing list_dot_product reproduces the ranking
    bit-for-bit. Returns (cid, id, rank) — integer columns only.
    """
    from .similarity import _cell_dist_structs, bounded_collect
    from ..functions.vectors import as_double

    if quota < 1:
        raise ValueError(f"quota must be >= 1, got {quota}")
    cent_rows = bounded_collect(
        centroids.select("cid", "cemb"), "cluster_quota_sample centroids"
    )
    if not cent_rows:
        # array_min over a ZERO-struct array is NULL — every row would land
        # in a silent NULL cell instead of failing; make it loud
        raise ValueError("cluster_quota_sample: empty centroid set")
    best = F.array_min(
        _cell_dist_structs(cent_rows, as_double(F.col(vec_col)), dim)
    )
    # project the struct ONCE, then split fields — two references to `best`
    # would evaluate the whole HOF distance array twice per row
    assigned = collection.select(
        F.col(id_col).alias("id"), best.alias("best")
    ).select("id", F.col("best.cid").alias("cid"), F.col("best.d").alias("d"))
    w = Window.partitionBy("cid").orderBy(F.col("d"), F.col("id"))
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= quota)
        .select("cid", "id", "rank")
    )


def pack_token_stream(
    df: DataFrame,
    id_col: str,
    shard_col: str,
    n_tok_col: str,
    budget: int,
) -> DataFrame:
    """Token-stream chunking (GPT-style sequence packing): within each shard,
    documents concatenate in id order into one token stream that is cut into
    fixed ``budget``-token chunks; each document is tagged with the chunk it
    STARTS in and its token offset inside that chunk.

    The assignment is a single prefix sum (window sum over the shard) plus
    integer div/mod — exact, deterministic, and one shuffle on the shard key.
    Scale: the window partitions by shard (language, source bucket, …), so
    parallelism is the shard count and no partition is unbounded — a global
    ORDER BY over 100 TB is exactly what this avoids. Returns
    (id, shard, n_tok, chunk_id, tok_offset).
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(n_tok_col).over(w), F.lit(0).cast("long"))
    return df.select(
        F.col(id_col).alias("id"),
        F.col(shard_col).alias("shard"),
        F.col(n_tok_col).alias("n_tok"),
        cum.alias("cum_before"),
    ).select(
        "id",
        "shard",
        "n_tok",
        F.expr(f"CAST(cum_before DIV {budget} AS BIGINT)").alias("chunk_id"),
        (F.col("cum_before") % budget).alias("tok_offset"),
    )
