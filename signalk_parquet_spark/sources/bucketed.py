"""Bucketed-table co-location — the shuffle-elimination path for the joins
that stay big on both sides at 100 TB.

SCALE.md's plan audit shows every dimension join broadcasts; the one
remaining sort-merge join at scale is fact ⋈ fact (lineitem ⋈ orders,
events ⋈ events-derived). Writing both sides bucketed by the join key with
the same bucket count lets Spark plan that join with NO Exchange on either
side: each task reads matching bucket files directly (hash(key) % n agrees
by construction), so the 100 TB shuffle disappears from the plan instead of
being "merely" optimized.

The reference has no equivalent (single-node DuckDB never shuffles); this is
engine-level capability the Spark target adds. Bucket metadata lives in the
session catalog (`saveAsTable`) — on a real deployment that's the shared
metastore; locally it's the session's warehouse dir.

Sizing rule of thumb at 100 TB: pick num_buckets so a bucket's largest
table slice stays near spark.sql.files.maxPartitionBytes (128 MB default)
— e.g. 60 TB of lineitem → ~500k buckets is too many files; bucket to
~8192 and let each bucket hold ~7 GB split across row groups, or bucket
per-partition (day) so bucket files stay small. Bucketed scans parallelize
per bucket file, so the floor on parallelism is num_buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table. Sorting by the
    bucket key inside each bucket file lets the join skip its Sort too."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. When both sides were
    written with the same num_buckets over ``on``, the physical plan carries
    no Exchange (verify with explain-plan tests; tests/test_plans.py locks
    this in)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
