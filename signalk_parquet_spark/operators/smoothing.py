"""Response smoothing: SMA and EMA (SURVEY §2.5 W6-W7).

The reference computes both in JS on the merged result rows
(src/HistoryAPI.ts:2015-2218): SMA = mean of the trailing N bucket values;
EMA = ``alpha*v + (1-alpha)*ema_prev`` seeded with the first value
(alpha default 0.2, src/HistoryAPI.ts:2081-2090).

Spark mapping:
  - SMA is a plain rows-frame window aggregate (JVM-side, codegen).
  - EMA is a sequential recurrence — not expressible as a frame window.
    We run it per-series with applyInPandas. Series are bounded (~500
    buckets by the default resolution rule), and the groupBy key is the
    series id, so this distributes across executors and each pandas call
    sees one small series. Safe at 100 TB because smoothing runs AFTER
    bucketing — cardinality is buckets, not raw rows.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sma(
    df: DataFrame,
    order_col: str,
    value_col: str,
    window_size: int,
    partition_cols: Sequence[str] = (),
    out_col: str = "sma",
) -> DataFrame:
    """Trailing simple moving average over the last ``window_size`` rows."""
    w = (
        Window.partitionBy(*[F.col(f"`{c}`") for c in partition_cols])
        .orderBy(F.col(f"`{order_col}`"))
        .rowsBetween(-(window_size - 1), 0)
    )
    # column names may contain dots/colons (History API path specs) — quote
    return df.withColumn(out_col, F.avg(F.col(f"`{value_col}`")).over(w))


def ema(
    df: DataFrame,
    order_col: str,
    value_col: str,
    alpha: float = 0.2,
    partition_cols: Sequence[str] = (),
    out_col: str = "ema",
) -> DataFrame:
    """Exponential moving average per series via grouped pandas UDF.

    Matches the reference recurrence exactly: seeded with the first value,
    then ema_i = alpha*v_i + (1-alpha)*ema_{i-1}; null values carry the
    previous ema forward (src/HistoryAPI.ts:2081-2090,2153-2160).
    """
    # PySpark's applyInPandas resolves df[col] with dot-parsing, so History
    # path-spec column names ("navigation.speedOverGround:ema5") break it —
    # work under positional aliases and restore names afterwards.
    orig = df.columns
    safe = {c: f"_c{i}" for i, c in enumerate(orig)}
    work = df.select(*[F.col(f"`{c}`").alias(safe[c]) for c in orig])
    part = [safe[c] for c in partition_cols] or ["__all"]
    if not partition_cols:
        work = work.withColumn("__all", F.lit(1))
    s_order, s_value = safe[order_col], safe[value_col]
    schema_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in work.schema.fields)
    out_schema = f"{schema_fields}, _ema_out double"

    def _ema(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(s_order).reset_index(drop=True)
        out, prev = [], None
        for v in pdf[s_value]:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                out.append(prev)
                continue
            prev = float(v) if prev is None else alpha * float(v) + (1.0 - alpha) * prev
            out.append(prev)
        pdf["_ema_out"] = out
        return pdf

    res = work.groupBy(*part).applyInPandas(_ema, schema=out_schema)
    if not partition_cols:
        res = res.drop("__all")
    return res.select(
        *[F.col(safe[c]).alias(c) for c in orig], F.col("_ema_out").alias(out_col)
    )
