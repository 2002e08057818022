"""v2 provider semantics (SURVEY §3 entry point 3) — the deliberate
differences from v1: blend-not-pick federation, [lon, lat] positions."""

from __future__ import annotations

from datetime import timedelta

import pytest

from signalk_parquet_spark.plans.history_v2 import HistoryProviderV2
from signalk_parquet_spark.sources.buffer import HotBuffer
from signalk_parquet_spark.sources.lake import Lake
from tests.records import T0, make_record, records_df, scalar_series

FROM = "2024-06-01T12:00:00Z"
TO = "2024-06-01T12:01:00Z"


def test_v2_unions_before_aggregation(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    lake.write_records(records_df(spark, scalar_series(T0, [9.0])), tier="raw")
    buf = HotBuffer(spark, str(tmp_path / "hot"))
    buf.append(records_df(spark, scalar_series(T0 + timedelta(seconds=1), [11.0])))
    v2 = HistoryProviderV2(lake, buf)
    df = v2.get_values("navigation.speedOverGround", FROM, TO, resolution_s=60)
    # v2 blends: AVG(9, 11) = 10 (the reference's federation golden,
    # write-read-pipeline.test.ts) — v1 would priority-pick 11
    assert df.collect()[0]["navigation.speedOverGround"] == 10.0


def test_v2_position_lon_lat_array(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    rows = [
        make_record(T0 + timedelta(seconds=i), "navigation.position",
                    {"latitude": 47.5, "longitude": 8.7})
        for i in range(3)
    ]
    lake.write_records(records_df(spark, rows), tier="raw")
    v2 = HistoryProviderV2(lake)
    val = v2.get_values("navigation.position", FROM, TO, resolution_s=60).collect()[0][
        "navigation.position"
    ]
    # [lon, lat] order (history-provider.ts:424-429)
    assert val == pytest.approx([8.7, 47.5])


def test_geo_destination_and_bbox_helpers():
    import math

    from signalk_parquet_spark.functions.geo import bbox_from_radius, destination_point

    # 111.2 km due north ≈ +1 degree latitude
    lat2, lon2 = destination_point(47.0, 8.0, 0.0, 111_195.0)
    assert lat2 == pytest.approx(48.0, abs=0.01)
    assert lon2 == pytest.approx(8.0, abs=1e-9)
    s, n, w, e = bbox_from_radius(47.0, 8.0, 111_195.0)
    assert s == pytest.approx(46.0, abs=0.01) and n == pytest.approx(48.0, abs=0.01)
    assert w < 8.0 < e
    # antimeridian wrap: west > east
    s, n, w, e = bbox_from_radius(0.0, 179.9, 50_000.0)
    assert w > e
