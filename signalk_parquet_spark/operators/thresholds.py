"""Threshold automation — condition evaluation with hysteresis
(SURVEY §2.8; reference src/commands.ts:1312-1448, operator list
src/types.ts:210-235).

Operators: gt lt eq ne range contains startsWith endsWith stringEquals
true false withinRadius outsideRadius inBoundingBox outsideBoundingBox.

The reference evaluates per-update in JS with an in-process hysteresis map;
here the condition is a Column predicate (usable in batch AND streaming
filter), and hysteresis-suppressed TRANSITIONS come from a lag window —
only state CHANGES fire, matching the reference's suppression semantics.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.geo import bbox_predicate, radius_predicate


def threshold_predicate(op: str, value_col: Column, params: dict[str, Any]) -> Column:
    v = value_col
    if op == "gt":
        return v.cast("double") > params["value"]
    if op == "lt":
        return v.cast("double") < params["value"]
    if op == "eq":
        return v.cast("double") == params["value"]
    if op == "ne":
        return v.cast("double") != params["value"]
    if op == "range":
        return v.cast("double").between(params["low"], params["high"])
    if op == "contains":
        return v.cast("string").contains(params["value"])
    if op == "startsWith":
        return v.cast("string").startswith(params["value"])
    if op == "endsWith":
        return v.cast("string").endswith(params["value"])
    if op == "stringEquals":
        return v.cast("string") == params["value"]
    if op == "true":
        return v.cast("boolean") == F.lit(True)
    if op == "false":
        return v.cast("boolean") == F.lit(False)
    if op in ("withinRadius", "outsideRadius"):
        pred = radius_predicate(
            params["lat_col"], params["lon_col"], params["lat"], params["lon"], params["radius_m"]
        )
        return pred if op == "withinRadius" else ~pred
    if op in ("inBoundingBox", "outsideBoundingBox"):
        pred = bbox_predicate(
            params["lat_col"], params["lon_col"],
            params["south"], params["north"], params["west"], params["east"],
        )
        return pred if op == "inBoundingBox" else ~pred
    raise ValueError(f"unknown threshold operator: {op}")


def threshold_transitions(
    df: DataFrame,
    ts_col: str,
    condition: Column,
    partition_cols: Sequence[str] = ("context", "path"),
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Hysteresis: emit only rows where the condition state CHANGES
    (false→true = 'activated', true→false = 'deactivated'); repeated
    triggers while the state holds are suppressed (commands.ts:951-957).

    ``tiebreak_cols`` extend the per-partition ordering past ``ts_col``:
    with same-timestamp rows the lag state (and therefore which row
    fires) would otherwise be partition-layout-dependent — pass a unique
    id column whenever the stream can carry duplicate timestamps."""
    w = Window.partitionBy(*partition_cols).orderBy(ts_col, *tiebreak_cols)
    flagged = df.withColumn("__cond", condition.cast("boolean")).withColumn(
        "__prev", F.lag("__cond").over(w)
    )
    return (
        flagged.filter(
            (F.col("__cond") & ~F.coalesce(F.col("__prev"), F.lit(False)))
            | (~F.col("__cond") & F.coalesce(F.col("__prev"), F.lit(False)))
        )
        .withColumn("event", F.when(F.col("__cond"), "activated").otherwise("deactivated"))
        .drop("__cond", "__prev")
    )
