"""As-of / interval joins — operators Spark lacks natively (SURVEY §2.4
notes the reference's spatial correlation J5 is "morally an as-of/interval
semi-join"; pyspark guide: bucketize + equi-join, or merge_asof per group).

Two scale-safe strategies, both avoiding the O(n*m) theta join:

  asof_join_window  — union both sides, one window pass per key carries the
                      most recent right-side value forward (zero joins; best
                      when both sides share the partition key).
  interval_join     — equi-join on (key, time-bucket) with each left row
                      probing its own + neighbor buckets, then an exact
                      |dt| <= tolerance filter. The bucket key bounds the
                      join fan-out regardless of data size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_window(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    right_value_col: str,
    out_col: str = "asof_value",
) -> DataFrame:
    """Backward as-of join: each left row gets the latest right-side value at
    or before its timestamp, per key. Implemented as a single
    last_value(IGNORE NULLS) window over the unioned stream — one shuffle on
    the key, no join at all."""
    l_tag = left.withColumn("__is_left", F.lit(True)).withColumn(
        "__rv", F.lit(None).cast(right.schema[right_value_col].dataType)
    )
    r_tag = (
        right.select(*on, ts_col, F.col(right_value_col).alias("__rv"))
        .withColumn("__is_left", F.lit(False))
    )
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before left rows at the same timestamp so an exact-tie
    # right value is visible to the left row ("at or before")
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("__carry", F.last("__rv", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("__is_left"))
        .drop("__is_left", "__rv")
        .withColumnRenamed("__carry", out_col)
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    tolerance_ms: int,
) -> DataFrame:
    """Pairs (left, right) with |left_ts - right_ts| <= tolerance, same key.
    Bucketized: right rows land in floor(ts/tol) buckets; each left row
    probes bucket-1, bucket, bucket+1 — an equi-join on (key, bucket), so
    the shuffle is bounded and skew-free at any scale."""
    tol = F.lit(tolerance_ms)
    lb = F.floor(F.unix_millis(F.col(left_ts)) / tol).cast("long")
    rb = F.floor(F.unix_millis(F.col(right_ts)) / tol).cast("long")
    l_exp = left.withColumn(
        "__bucket", F.explode(F.array(lb - 1, lb, lb + 1))
    )
    r_b = right.withColumn("__bucket", rb)
    joined = l_exp.join(r_b, [*on, "__bucket"])
    dt = F.abs(F.unix_millis(F.col(left_ts)) - F.unix_millis(F.col(right_ts)))
    return joined.filter(dt <= tol).drop("__bucket")
