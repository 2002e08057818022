"""Measured ramp: prefix-filtered containment join vs the full-probe
inverted index, as the corpus grows — the axis the SSJoin prefix filter
is for.

Both plans share the same index side (every shingle of every doc — the
thing containment can't shrink, since a contained doc may sit anywhere
inside an arbitrarily large container) and the same exact verify; the
ONLY difference is the probe side:

  full-probe:  the probe explodes ALL its shingles — candidates are
               every doc pair sharing any shingle (naive inverted-index
               AllPairs);
  prefix:      the probe explodes only its pigeonhole prefix
               (|A| − ceil(t·|A|) + 1 shingles) — hash-ordered
               (rare_first=False) and df-ordered rarest-first (the
               operator default; classic AllPairs ordering).

Differential per row: identical (id_a, id_b, inter) output sets — the
prefix provably loses nothing; this ramp re-proves it at every size
while measuring what the filter actually buys: candidate volume and
wall. The corpus plants one 12-token quote (+2 noise tokens) per 10
docs, sliced from a real corpus doc, so the true pair set is non-empty
and containment ≈ 10/12 per planted pair.

Run: python tools/containment_ramp.py   (~4-6 min; prints one table)

The full-probe column stops at 160k: its candidate join grows with the
square of shingle heat and already times a sandbox out past that — which
is the point being measured. The 320k row shows the ordering trade:
rare-first candidates stay ~= the true pair count (linear growth; 693x
under hash order), while its reorder pass costs more LOCAL wall than the
avoided join below ~1M docs — at cluster scale candidate volume is the
exchange, so rare-first is the operator default.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from signalk_parquet_spark.functions.text import distinct_shingles, hashed_shingles  # noqa: E402
from signalk_parquet_spark.operators.dedup import containment_pairs  # noqa: E402
from signalk_parquet_spark.session import get_spark  # noqa: E402

T = 0.8
DOC_LEN = 40
VOCAB = 50_000
QUOTE_EVERY = 10


def synth_corpus(spark, n: int) -> DataFrame:
    """n base docs of DOC_LEN tokens — natural-text-like mix: 60% of
    positions draw from a 40-term stopword pool (so shingles REPEAT
    across unrelated docs, the regime where candidate filtering earns
    its keep), 40% from a VOCAB-term rare pool — plus n/QUOTE_EVERY
    quote docs: a 12-token contiguous slice of base doc (7919·q mod n)
    with 2 noise tokens appended."""
    h = F.xxhash64(F.col("doc_id"), F.col("pos"), F.lit("corp"))
    stop = F.concat(F.lit("s"), F.pmod(h, F.lit(40)))
    rare = F.concat(F.lit("t"), F.pmod(h, F.lit(VOCAB)))
    term = F.when(F.pmod(F.xxhash64(h), F.lit(5)) < 3, stop).otherwise(rare)
    base = (
        spark.range(n, numPartitions=32)
        .select(F.col("id").alias("doc_id"))
        .select("doc_id", F.explode(F.sequence(F.lit(1), F.lit(DOC_LEN))).alias("pos"))
        .select("doc_id", term.alias("term"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("term")).alias("text"))
    )
    src = F.pmod(F.col("doc_id") * 7919, F.lit(n))
    quotes = (
        spark.range(n // QUOTE_EVERY, numPartitions=32)
        .select((F.col("id") + n).alias("doc_id"))
        .withColumn("src", src)
        .join(base.select(F.col("doc_id").alias("src"), F.col("text").alias("src_text")), "src")
        .select(
            "doc_id",
            F.concat(
                F.concat_ws(" ", F.slice(F.split("src_text", " "), 6, 12)),
                F.lit(" q"), F.col("doc_id"), F.lit(" r"), F.col("doc_id"),
            ).alias("text"),
        )
    )
    return base.unionByName(quotes)


def fullprobe_pairs(d: DataFrame) -> DataFrame:
    """The operator's verify on FULL-probe candidates (every shared
    shingle) — identical output, unfiltered probe volume."""
    a = d.select("id", "sz", F.explode("shl").alias("tok")).alias("a")
    b = d.select("id", "sz", F.explode("shl").alias("tok")).alias("b")
    t_eps = T - 1e-9
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") != F.col("b.id"))
            & (F.col("b.sz") >= F.lit(t_eps) * F.col("a.sz")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    da = d.select(F.col("id").alias("id_a"), F.col("shl").alias("shl_a"),
                  F.col("sz").alias("size_a"))
    db = d.select(F.col("id").alias("id_b"), F.col("shl").alias("shl_b"))
    inter = F.size(F.array_intersect(F.col("shl_a"), F.col("shl_b"))).cast("long")
    return (
        cand.join(da, "id_a").join(db, "id_b")
        .select("id_a", "id_b", inter.alias("inter"), "size_a",
                (inter / F.col("size_a")).alias("containment"))
        .filter(F.col("containment") >= T)
    )


def main() -> None:
    spark = get_spark("containment-ramp")
    print(f"t={T} doc_len={DOC_LEN} vocab={VOCAB} quote_every={QUOTE_EVERY}")
    hdr = (f"{'docs':>8} {'rare_cand':>10} {'hash_cand':>10} {'full_cand':>10} "
           f"{'rare_s':>7} {'hash_s':>7} {'full_s':>7} {'pairs':>7} {'mismatch':>8}")
    print(hdr)
    for n in (10_000, 40_000, 160_000, 320_000):
        docs = synth_corpus(spark, n).persist()
        docs.count()
        d = (
            docs.select("doc_id", hashed_shingles(distinct_shingles("text")).alias("shl"))
            .select(F.col("doc_id").alias("id"), F.sort_array("shl").alias("shl"))
            .withColumn("sz", F.size("shl").cast("long"))
            .filter(F.col("sz") > 0)
            .persist()
        )
        d.count()
        try:
            # df-ordered twin of d (the operator's rare_first reorder)
            ex = d.select("id", F.explode("shl").alias("tok"))
            dfreq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
            d_rare = (
                d.join(
                    ex.join(dfreq, "tok")
                    .groupBy("id")
                    .agg(F.array_sort(F.collect_list(F.struct("_df", "tok"))).alias("_st"))
                    .select("id", F.transform(F.col("_st"), lambda s: s["tok"]).alias("_o")),
                    "id",
                )
                .withColumn("shl", F.col("_o")).drop("_o")
                .persist()
            )
            d_rare.count()

            # candidate volumes (counted on the persisted frames)
            m_req = F.ceil(F.col("sz") * F.lit(T) - F.lit(1e-9)).cast("long")
            t_eps = T - 1e-9
            def cand_count(frame: DataFrame, probe_col: str) -> int:
                probe = frame.withColumn(
                    "pre",
                    F.slice(F.col("shl"), 1, (F.col("sz") - m_req + 1).cast("int")),
                )
                a = probe.select("id", "sz", F.explode(probe_col).alias("tok")).alias("a")
                b = d.select("id", "sz", F.explode("shl").alias("tok")).alias("b")
                return (
                    a.join(
                        b,
                        (F.col("a.tok") == F.col("b.tok"))
                        & (F.col("a.id") != F.col("b.id"))
                        & (F.col("b.sz") >= F.lit(t_eps) * F.col("a.sz")),
                    )
                    .select("a.id", "b.id").distinct().count()
                )
            rare_cand = cand_count(d_rare, "pre")
            hash_cand = cand_count(d, "pre")
            # the full probe is already quadratic-dead by 160k; skip past it
            full_cand = cand_count(d, "shl") if n <= 160_000 else -1

            t0 = time.time()
            got = {
                (r["id_a"], r["id_b"]): r["inter"]
                for r in containment_pairs(docs, "doc_id", "text", [], T).collect()
            }
            t_rare = time.time() - t0

            t0 = time.time()
            got_h = {
                (r["id_a"], r["id_b"]): r["inter"]
                for r in containment_pairs(
                    docs, "doc_id", "text", [], T, rare_first=False
                ).collect()
            }
            t_hash = time.time() - t0

            if n <= 160_000:
                t0 = time.time()
                want = {
                    (r["id_a"], r["id_b"]): r["inter"]
                    for r in fullprobe_pairs(d).collect()
                }
                t_full = time.time() - t0
            else:
                want, t_full = got_h, float("nan")

            mism = len(set(got) ^ set(want)) + len(set(got_h) ^ set(want)) + sum(
                1 for k in got if k in want and got[k] != want[k]
            )
            print(f"{n:>8} {rare_cand:>10} {hash_cand:>10} {full_cand:>10} "
                  f"{t_rare:>7.1f} {t_hash:>7.1f} {t_full:>7.1f} "
                  f"{len(got):>7} {mism:>8}")
        finally:
            docs.unpersist(); d.unpersist(); d_rare.unpersist()


if __name__ == "__main__":
    main()
