"""Synthetic DataRecord builders — the reference's test record helpers
(test/integration/helpers/records.ts: makeScalarRecord/makePositionRecord)
re-expressed for Spark DataFrames."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from signalk_parquet_spark.schema import flatten_value, record_schema


def make_record(
    ts: datetime,
    path: str,
    value: Any,
    context: str = "vessels.test-self",
    source_label: str = "gps-1",
    meta: str | None = None,
) -> dict:
    base = {
        "received_timestamp": ts,
        "signalk_timestamp": ts,
        "context": context,
        "path": path,
        "source": '{"label":"%s"}' % source_label,
        "source_label": source_label,
        "source_type": "NMEA2000",
        "source_pgn": 129026.0,
        "source_src": "115",
        "meta": meta,
    }
    base.update(flatten_value(value))
    return base


def records_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    extra: dict[str, Any] = {}
    for r in rows:
        for k, v in r.items():
            if k.startswith("value_") and k not in ("value_text", "value_bool", "value_json"):
                from pyspark.sql import types as T

                extra[k[len("value_"):]] = (
                    T.DoubleType() if isinstance(v, float) else T.StringType()
                )
    schema = record_schema(extra)
    names = [f.name for f in schema.fields]
    data = [tuple(r.get(n) for n in names) for r in rows]
    return spark.createDataFrame(data, schema)


def scalar_series(
    start: datetime,
    values: list[float],
    path: str = "navigation.speedOverGround",
    step_s: float = 1.0,
    **kw,
) -> list[dict]:
    return [
        make_record(start + timedelta(seconds=i * step_s), path, v, **kw)
        for i, v in enumerate(values)
    ]


UTC = timezone.utc
T0 = datetime(2024, 6, 1, 12, 0, 0, tzinfo=UTC)  # leap year, day-of-year 153
