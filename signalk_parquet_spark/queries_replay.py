"""Historical-replay schedule gate (SURVEY §2.8 — the reference feature
marked "not yet functional", made to work; streaming/replay.py).

Added post-window in r5 (the 50-slot window was already committed to the
r5 rotation set); rotates into the r6 window per the CLAUDE.md policy.
Until then: local parity at sf0.01 + sf0.001 and tests/test_replay.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.time import bucket_iso
from .registry import dd_bucket, load, register

_H = 3600_000
_TYPES = ("click", "error", "purchase")
_BATCH = 10


@register(
    "replay_schedule",
    f"""
    WITH b AS (
      SELECT event_type AS path, {dd_bucket(_H)} AS ts,
             round(avg(value), 6) AS value
      FROM events
      WHERE event_type IN ('click', 'error', 'purchase')
      GROUP BY 1, 2
    ), r AS (
      SELECT ts, path, value,
             row_number() OVER (ORDER BY ts, path) - 1 AS seq
      FROM b
    )
    SELECT seq // {_BATCH} AS batch_idx, seq, ts, path, value FROM r
    """,
)
def replay_schedule(spark: SparkSession, sf: str) -> DataFrame:
    """The distributed half of historical replay: a History-shaped wide
    frame (1h-bucket averages pivoted per series, the align_pivot shape)
    melted to emission order — (batch_idx, seq, ts, path, value) with the
    reference's 10-points-per-tick batching (historical-streaming.ts:
    184-225). The oracle rebuilds the total order from the long form
    directly, so it verifies both the melt (incl. dropping the nulls a
    pivot introduces for missing (series, bucket) combos — the
    reference's `value !== null` skip at :198) and the batch assignment.
    streaming/replay.replay paces this schedule through a delta emitter;
    the driver-side part is tested with an injected clock."""
    from .streaming.replay import emission_schedule

    e = load(spark, sf, "events").filter(F.col("event_type").isin(*_TYPES))
    wide = (
        e.groupBy(bucket_iso("ts", _H).alias("bucket_ts"))
        .pivot("event_type", list(_TYPES))
        .agg(F.round(F.avg("value"), 6))
    )
    # all-numeric series here, so value_str is all-null — dropped to keep
    # the oracle's column set (string series are covered by test_replay)
    return emission_schedule(wide, batch_points=_BATCH).drop("value_str")
