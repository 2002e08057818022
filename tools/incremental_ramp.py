"""Measured ramp for incremental tier maintenance (SCALE.md source).

The claim under test: rollup_incremental's cost is bounded by the LATE
DATA's (series, day) spread, not by history size — while the reference's
maintenance model (full recompute of the tier) grows with history. Build
a lake with H days of history across S series, land a fixed-size late
batch touching ONE (context, path, day) partition, and time both
maintenance strategies as H grows.

Run: python tools/incremental_ramp.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from signalk_parquet_spark.operators.incremental import rollup_incremental  # noqa: E402
from signalk_parquet_spark.operators.rollup import rollup_scalar  # noqa: E402
from signalk_parquet_spark.session import get_spark  # noqa: E402
from signalk_parquet_spark.sources.lake import Lake  # noqa: E402

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
ROWS_PER_DAY = 2_000  # per series


def build_history(spark, lake: Lake, days: int, series: int) -> None:
    """Executor-generated raw history: days x series x ROWS_PER_DAY rows,
    one write, then the initial 1h tier."""
    n = days * series * ROWS_PER_DAY
    df = (
        spark.range(n)
        .withColumn("day", (F.col("id") % days))
        .withColumn("ser", (F.col("id") / days).cast("long") % series)
        .withColumn("slot", (F.col("id") / (days * series)).cast("long"))
        .select(
            F.lit(None).cast("timestamp").alias("received_timestamp"),
            (
                F.lit(T0)
                + F.make_dt_interval(days=F.col("day"))
                + F.make_dt_interval(secs=F.col("slot") * 43)
            ).alias("signalk_timestamp"),
            F.concat(F.lit("vessels.s"), F.col("ser")).alias("context"),
            F.lit("environment.wind.speedApparent").alias("path"),
            (F.col("id") % 997).cast("double").alias("value"),
            F.lit(None).cast("string").alias("value_text"),
            F.lit(None).cast("boolean").alias("value_bool"),
            F.lit(None).cast("string").alias("value_json"),
            F.lit('{"label":"ramp"}').alias("source"),
            F.lit("ramp").alias("source_label"),
            F.lit("ramp").alias("source_type"),
            F.lit(None).cast("double").alias("source_pgn"),
            F.lit(None).cast("string").alias("source_src"),
            F.lit(None).cast("string").alias("meta"),
        )
    )
    lake.write_records(df, tier="raw")
    lake.write_rollup(
        rollup_scalar(lake.read(tier="raw").drop("tier", "year", "day"), "1h"), "1h"
    )


def late_batch(spark, n: int = 200):
    """Fixed-size late batch for series 0, day 0 — one touched partition."""
    return (
        spark.range(n)
        .select(
            F.lit(None).cast("timestamp").alias("received_timestamp"),
            (F.lit(T0) + F.make_dt_interval(secs=F.col("id") * 311 + 7)).alias(
                "signalk_timestamp"
            ),
            F.lit("vessels.s0").alias("context"),
            F.lit("environment.wind.speedApparent").alias("path"),
            (F.col("id") + 10_000).cast("double").alias("value"),
            F.lit(None).cast("string").alias("value_text"),
            F.lit(None).cast("boolean").alias("value_bool"),
            F.lit(None).cast("string").alias("value_json"),
            F.lit('{"label":"ramp"}').alias("source"),
            F.lit("ramp").alias("source_label"),
            F.lit("ramp").alias("source_type"),
            F.lit(None).cast("double").alias("source_pgn"),
            F.lit(None).cast("string").alias("source_src"),
            F.lit(None).cast("string").alias("meta"),
        )
    )


def main() -> None:
    spark = get_spark("incremental_ramp")
    spark.range(32).mapInPandas(lambda it: it, "id long").count()  # warm Arrow
    series = 8
    print(f"incremental maintenance ramp ({series} series, "
          f"{ROWS_PER_DAY} rows/series/day, late batch = 200 rows, 1 touched partition)")
    for days in (4, 16, 64):
        root = tempfile.mkdtemp(prefix="spark_graft_incr_ramp_")
        try:
            lake = Lake(spark, root)
            build_history(spark, lake, days, series)
            late = late_batch(spark)
            lake.write_records(late, tier="raw", mode="append")
            late.persist().count()

            t = time.time()
            touched = rollup_incremental(lake, late, "1h")
            incr_s = time.time() - t

            t = time.time()
            lake.write_rollup(
                rollup_scalar(lake.read(tier="raw").drop("tier", "year", "day"), "1h"),
                "1h",
            )
            full_s = time.time() - t
            rows = days * series * ROWS_PER_DAY
            print(
                f"  history={days:3d}d ({rows:>9,} rows): incremental {incr_s:5.1f} s"
                f" ({touched} partition) vs full recompute {full_s:5.1f} s"
                f"  ({full_s / incr_s:4.1f}x)"
            )
            late.unpersist()
        finally:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
