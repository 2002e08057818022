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
