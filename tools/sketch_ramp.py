"""Measured ramp: Misra–Gries 2-pass exact frequent tokens vs the naive
full groupBy, as the VOCABULARY grows (the axis that actually costs).

The bench corpus's 31-token vocabulary is the degenerate case for the
naive plan — partial aggregation collapses everything map-side and the
exchange carries ~31 rows/partition. Real corpora have 10^6..10^9 distinct
tokens; then the groupBy exchange carries ~distinct-per-partition rows
and the reduce side builds a corpus-sized hash table. The MG pass exchanges
NOTHING (pass 1 is map-only; the driver collect is partitions × m rows)
and pass 2's exchange is ≤ m keys.

Corpus: executor-generated docs of 100 Zipf(1.3)-distributed tokens over a
V-token vocabulary (heavy head, so true heavy hitters exist at every V).
Per row we report both walls, the EXCHANGE-ROW proxies (distinct tokens vs
partitions × m + m), and a set-equality differential of the two outputs.

Honesty note: pass 1's token loop is Python (Arrow-batched); the naive
groupBy's map side is JVM codegen. On local[32] with zero network cost the
JVM constant can win on wall even while shuffling 10^6 rows — the claim
this ramp quantifies is the EXCHANGE-VOLUME asymmetry (what a 1000-executor
network pays), not a local-wall win. Read both columns.

Run: python tools/sketch_ramp.py  (~2-4 min; prints one table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from signalk_parquet_spark.operators.sketch import (  # noqa: E402
    frequent_tokens_exact,
    partition_sketches,
)
from signalk_parquet_spark.session import get_spark  # noqa: E402

N_DOCS = 40_000
TOK_PER_DOC = 100
M = 64
PARTS = 32


def corpus(spark, vocab: int):
    """Executor-generated Zipf(1.3) corpus — deterministic per partition."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for pid in pdf["id"].tolist():
                rng = np.random.default_rng(1000 + pid)
                n = N_DOCS // PARTS
                draws = rng.zipf(1.3, size=(n, TOK_PER_DOC))
                draws = np.minimum(draws, vocab) - 1  # cap tail into the vocab
                rows.extend(
                    " ".join(f"w{t}" for t in doc) for doc in draws
                )
            yield pd.DataFrame({"text": rows})

    df = spark.range(PARTS).repartition(PARTS).mapInPandas(gen, "text string")
    df = df.persist()
    df.count()
    return df


def naive_exact(df):
    toks = df.select(F.explode(F.split("text", " ")).alias("token"))
    total = df.select(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("total")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(M + 1) > F.col("total"))
        .select("token", "cnt")
    )


def main() -> None:
    spark = get_spark("sketch-ramp")
    print(f"docs={N_DOCS} tok/doc={TOK_PER_DOC} m={M} parts={PARTS}")
    print(
        f"{'vocab':>9} {'distinct':>9} {'heavies':>8} {'naive_s':>8} "
        f"{'mg_s':>7} {'xchg_naive':>11} {'xchg_mg':>8} {'match':>6}"
    )
    for vocab in (1_000, 100_000, 2_000_000):
        df = corpus(spark, vocab)
        try:
            t0 = time.time()
            naive = {r["token"]: r["cnt"] for r in naive_exact(df).collect()}
            t_naive = time.time() - t0
            t0 = time.time()
            mg = {
                r["token"]: r["cnt"]
                for r in frequent_tokens_exact(df, "text", M).collect()
            }
            t_mg = time.time() - t0
            distinct = (
                df.select(F.explode(F.split("text", " ")).alias("t"))
                .distinct()
                .count()
            )
            sketch_rows = partition_sketches(df, "text", M).count()
            print(
                f"{vocab:>9} {distinct:>9} {len(naive):>8} {t_naive:>8.2f} "
                f"{t_mg:>7.2f} {distinct:>11} {sketch_rows + M:>8} "
                f"{'OK' if naive == mg else 'DIVERGED':>6}"
            )
            if naive != mg:
                raise SystemExit(f"differential failed at vocab={vocab}")
        finally:
            df.unpersist()

    # --- tree-merge rung at high partition counts (r9 verdict Next #6) ---
    # The driver merge collects partitions x m sketch rows — the family's
    # only O(P) driver-side step. The rung (forced on here via a zero
    # driver budget) collapses to sqrt(P) x m BEFORE the collect; the
    # PODS'12 merge guarantee composes, so the exact output is unchanged.
    from signalk_parquet_spark.operators import sketch as sk

    print("\ntree-merge rung (forced): driver-collect rows, P*m vs sqrt(P)*m")
    print(
        f"{'parts':>6} {'direct_rows':>12} {'tree_rows':>10} "
        f"{'direct_s':>9} {'tree_s':>7} {'match':>6}"
    )
    base = corpus(spark, 100_000)
    try:
        for parts in (128, 512):
            df = base.repartition(parts)
            direct_rows = partition_sketches(df, "text", M).count()
            t0 = time.time()
            direct = {
                r["token"]: r["cnt"]
                for r in frequent_tokens_exact(df, "text", M).collect()
            }
            t_direct = time.time() - t0
            groups = max(1, int(parts**0.5))
            tree_rows = sk.tree_merge_sketches(
                partition_sketches(df, "text", M), M, groups
            ).count()
            old = sk._DRIVER_MERGE_MAX_ROWS
            sk._DRIVER_MERGE_MAX_ROWS = 0
            try:
                t0 = time.time()
                treed = {
                    r["token"]: r["cnt"]
                    for r in frequent_tokens_exact(df, "text", M).collect()
                }
                t_tree = time.time() - t0
            finally:
                sk._DRIVER_MERGE_MAX_ROWS = old
            ok = direct == treed
            print(
                f"{parts:>6} {direct_rows:>12} {tree_rows:>10} "
                f"{t_direct:>9.2f} {t_tree:>7.2f} {'OK' if ok else 'DIVERGED':>6}"
            )
            if not ok:
                raise SystemExit(f"tree-merge differential failed at parts={parts}")
    finally:
        base.unpersist()




# --- grouped mode (r11): per-language heavy hitters vs the per-group shuffle ---
def grouped_corpus(spark, vocab: int, n_groups: int):
    """Same Zipf corpus, each doc tagged with a language; group sizes are
    made uneven (zipf over the group index) so per-group thresholds
    genuinely differ."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            texts, langs = [], []
            for pid in pdf["id"].tolist():
                rng = np.random.default_rng(5000 + pid)
                n = N_DOCS // PARTS
                draws = rng.zipf(1.3, size=(n, TOK_PER_DOC))
                draws = np.minimum(draws, vocab) - 1
                gidx = np.minimum(rng.zipf(1.5, size=n), n_groups) - 1
                texts.extend(" ".join(f"w{t}" for t in doc) for doc in draws)
                langs.extend(f"g{g}" for g in gidx)
            yield pd.DataFrame({"lang": langs, "text": texts})

    df = spark.range(PARTS).repartition(PARTS).mapInPandas(gen, "lang string, text string")
    df = df.persist()
    df.count()
    return df


def naive_grouped_exact(df):
    toks = df.select("lang", F.explode(F.split("text", " ")).alias("token"))
    totals = df.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).cast("long").alias("total")
    )
    return (
        toks.groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(totals), "lang")
        .filter(F.col("cnt") * F.lit(M + 1) > F.col("total"))
        .select("lang", "token", "cnt")
    )


def groups_mode() -> None:
    from signalk_parquet_spark.operators.sketch import (
        grouped_frequent_tokens_exact,
        grouped_partition_sketches,
    )

    spark = get_spark("sketch-ramp-groups")
    vocab = 100_000
    print(f"docs={N_DOCS} tok/doc={TOK_PER_DOC} m={M} parts={PARTS} vocab={vocab}")
    print(
        f"{'groups':>7} {'heavies':>8} {'naive_s':>8} {'mg_s':>7} {'mg_tree_s':>9} "
        f"{'xchg_naive':>11} {'xchg_mg':>8} {'match':>6}"
    )
    for n_groups in (4, 64, 512):
        df = grouped_corpus(spark, vocab, n_groups)
        try:
            t0 = time.time()
            naive = {
                (r["lang"], r["token"]): r["cnt"]
                for r in naive_grouped_exact(df).collect()
            }
            t_naive = time.time() - t0
            t0 = time.time()
            mg = {
                (r["lang"], r["token"]): r["cnt"]
                for r in grouped_frequent_tokens_exact(
                    df, "text", "lang", M, force_tree_merge=False
                ).collect()
            }
            t_mg = time.time() - t0
            t0 = time.time()
            mg_tree = {
                (r["lang"], r["token"]): r["cnt"]
                for r in grouped_frequent_tokens_exact(
                    df, "text", "lang", M, force_tree_merge=True
                ).collect()
            }
            t_tree = time.time() - t0
            # exchange proxies: the naive plan shuffles ~distinct (lang,
            # token) pairs per partition; the sketch path's only exchange
            # (rung mode) is the metadata-sized sketch rows themselves
            distinct_lt = (
                df.select("lang", F.explode(F.split("text", " ")).alias("t"))
                .distinct()
                .count()
            )
            sketch_rows = grouped_partition_sketches(df, "text", "lang", M).count()
            ok = naive == mg == mg_tree
            print(
                f"{n_groups:>7} {len(naive):>8} {t_naive:>8.2f} {t_mg:>7.2f} "
                f"{t_tree:>9.2f} {distinct_lt:>11} {sketch_rows:>8} "
                f"{'OK' if ok else 'DIVERGED':>6}"
            )
            if not ok:
                raise SystemExit(f"grouped differential failed at G={n_groups}")
        finally:
            df.unpersist()


if __name__ == "__main__":
    groups_mode() if "--groups" in sys.argv[1:] else main()
