"""Measured ramp: global shuffle rank vs the global-sort window it avoids.

Same synthetic frame (hash-keyed ids, executor-generated), two plans for
the IDENTICAL permutation position:

  operator:  global_shuffle_rank — hash exchange on the key's 16-bit
             prefix bucket + a buckets-row offset broadcast; parallelism
             = buckets, no range partitioner, no sampling pass;
  window:    row_number() OVER (ORDER BY key, id) — Spark serializes an
             unpartitioned window onto ONE partition (the WindowExec
             warning it prints is the point), the same baseline shape
             the selection ramp uses.

Each row reports both walls plus a DISTRIBUTED differential (join on id,
count positions that disagree — scalar to the driver, never the data).
Measured shape (local[32], post-warmup): 2M rows 2.6 s vs 2.8 s, 8M
3.0 s vs 9.9 s, 32M 9.3 s vs 39.6 s — the single-partition sort grows
superlinearly while the bucketed plan tracks data volume; at cluster
scale the window baseline is additionally the whole dataset funneled
through one machine, i.e. not runnable at all.

Run: python tools/ordering_ramp.py   (~2-3 min; prints one table)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from signalk_parquet_spark.operators.ordering import global_shuffle_rank  # noqa: E402
from signalk_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("ordering-ramp")
    # warm the session's codegen/shuffle machinery so row 1 isn't charged
    # JVM startup (the selection ramp's first-row lesson)
    warm = spark.range(100_000).select(F.col("id").alias("doc_id"))
    global_shuffle_rank(warm, "doc_id").agg(F.sum("pos")).collect()
    print(f"{'rows':>10} {'shuffle_rank_s':>14} {'window_sort_s':>13} {'mismatches':>10}")
    for n in (2_000_000, 8_000_000, 32_000_000):
        df = spark.range(n, numPartitions=32).select(F.col("id").alias("doc_id")).persist()
        df.count()
        try:
            t0 = time.time()
            ranked = global_shuffle_rank(df, "doc_id")
            ranked.agg(F.sum("pos")).collect()  # force full compute, scalar back
            t_op = time.time() - t0
            key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("shuffle")))
            w = Window.orderBy(key, "doc_id")
            t0 = time.time()
            win = df.select("doc_id", F.row_number().over(w).cast("long").alias("wpos"))
            win.agg(F.sum("wpos")).collect()
            t_win = time.time() - t0
            mism = (
                ranked.join(win, "doc_id")
                .filter(F.col("pos") != F.col("wpos"))
                .count()
            )
            print(f"{n:>10} {t_op:>14.2f} {t_win:>13.2f} {mism:>10}")
            if mism:
                raise SystemExit(f"differential failed at n={n}: {mism} mismatches")
        finally:
            df.unpersist()


if __name__ == "__main__":
    main()
