"""Deterministic global corpus ordering without a global sort.

The last step before sequence packing is "shuffle the corpus": give every
document a GLOBAL position under a pseudorandom-but-reproducible
permutation, so training order is (a) decorrelated from ingest order and
(b) identical across reruns, retries and engines. The naive plan —
``row_number() OVER (ORDER BY md5(id))`` — is a RANGE exchange of the
whole dataset plus a skew-prone sampled partitioner: the one shuffle
shape this engine never emits at 100 TB.

The exact same permutation costs one HASH exchange instead, because the
sort key is a uniform hash whose distribution is known a priori — no
sampling, no range partitioner:

  bucket:  a monotone function of the key's 16-bit prefix — rows with
           key1 < key2 can never land in bucket(key1) > bucket(key2), so
           per-bucket ranks compose into a global rank;
  rank:    row_number within bucket (hash exchange on bucket; each task
           externally sorts only its buckets' rows);
  offset:  bucket row-counts are a ``buckets``-row aggregate — metadata-
           sized — whose exclusive prefix sum broadcast-joins back as
           each bucket's global offset. pos = offset + rank.

Uniformity makes the buckets even (each holds ~N/buckets rows ±
binomial noise), which is exactly what a sampled range partitioner
tries to approximate — here it is guaranteed by construction. Parallelism
is ``buckets``; size it so one bucket's rows fit a task's external sort
(~N·row_bytes/buckets ≈ 1 GB).

No reference parity claim: the reference has no corpus-ordering surface;
this is a beyond-reference LLM-pipeline operator (BASELINE extension
set) in the weighted_sample/pack_token_stream family — content-hash
determinism over rand() for resumability (same argument as
operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..localrel import local_frame

#: 16-bit key-prefix space the bucket function divides
_PREFIX_SPACE = 1 << 16


def global_shuffle_rank(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    buckets: int = 256,
) -> DataFrame:
    """Exact 1-based global position of every row under the deterministic
    permutation ORDER BY (md5(id || salt), id) — bit-identical to a global
    row_number (the oracle formulation) but planned as a hash exchange on
    the key-prefix bucket, never a range exchange. NULL ids are excluded
    (md5(NULL) is NULL and has no place in a permutation); vary ``salt``
    for an independent epoch order. Returns (id_col, pos BIGINT) with pos
    exactly 1..N.

    ``buckets`` must be in [1, 65536]: the bucket is floor(prefix *
    buckets / 2^16) of the key's first 4 hex chars — monotone in the key,
    so bucket order composes with in-bucket key order into the total
    order. The bucket-count collect is ``buckets`` scalar rows (driver
    metadata, like selection's histograms), and the offsets return as a
    broadcast join — the data itself never leaves its hash partitions."""
    if not 1 <= buckets <= _PREFIX_SPACE:
        raise ValueError(f"buckets must be in [1, {_PREFIX_SPACE}], got {buckets}")
    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt)))
    prefix = F.conv(F.substring(key, 1, 4), 16, 10).cast("long")
    bucket = ((prefix * buckets) / F.lit(_PREFIX_SPACE)).cast("long")
    keyed = (
        df.filter(F.col(id_col).isNotNull())
        .select(F.col(id_col), key.alias("_key"), bucket.alias("_bkt"))
    )
    counts = sorted(
        (r["_bkt"], r["n"])
        for r in keyed.groupBy("_bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for b, n in counts:
        offsets.append((b, acc))
        acc += n
    off = local_frame(keyed.sparkSession, offsets, "_bkt long, _off long")
    w = Window.partitionBy("_bkt").orderBy("_key", id_col)
    return (
        keyed.withColumn("_rn", F.row_number().over(w).cast("long"))
        .join(F.broadcast(off), "_bkt")
        .select(id_col, (F.col("_off") + F.col("_rn")).alias("pos"))
    )
