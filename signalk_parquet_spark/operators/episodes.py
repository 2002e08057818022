"""Boolean-state episode detection (SURVEY §2.4 J3 / §2.5 W3).

The reference finds regimen episodes with LAG over a boolean series:
false→true transitions are starts, true→false are ends, and each start is
matched to the minimum end after it via a correlated LEFT JOIN subquery
(src/claude-analyzer.ts:3206-3259).

Spark-first form: no correlated subquery — keep only transition rows, then
``LEAD(ts)`` over the ts-ordered transitions gives each start its end
directly (transitions strictly alternate). One window, one shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.time import as_utc_timestamp, iso_utc


def episodes(
    df: DataFrame,
    ts_col: str,
    state: Column,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Return one row per completed episode: start_ts, end_ts, duration_ms.

    ``state`` is any boolean Column over ``df``. Open episodes (state still
    true at the end of the data) are omitted, matching the reference's
    completed-episode listing.
    """
    ts = as_utc_timestamp(ts_col)
    w = Window.partitionBy(*partition_cols).orderBy(ts)
    flagged = df.select(
        *partition_cols,
        ts.alias("__ts"),
        state.cast("boolean").alias("__state"),
    ).withColumn("__prev", F.lag("__state").over(Window.partitionBy(*partition_cols).orderBy("__ts")))

    transitions = flagged.filter(
        (F.col("__state") & ~F.coalesce(F.col("__prev"), F.lit(False)))
        | (~F.col("__state") & F.coalesce(F.col("__prev"), F.lit(False)))
    )
    wt = Window.partitionBy(*partition_cols).orderBy("__ts")
    paired = transitions.withColumn("__next_ts", F.lead("__ts").over(wt))
    starts = paired.filter(F.col("__state") & F.col("__next_ts").isNotNull())
    return starts.select(
        *partition_cols,
        iso_utc(F.col("__ts")).alias("start_ts"),
        iso_utc(F.col("__next_ts")).alias("end_ts"),
        (F.unix_millis(F.col("__next_ts")) - F.unix_millis(F.col("__ts"))).alias("duration_ms"),
    )
