"""PathSpec grammar + time-range patterns + tier routing (planner layer)."""

from datetime import datetime, timezone

import pytest

from signalk_parquet_spark.plans.pathspec import parse_path_spec, parse_paths_param
from signalk_parquet_spark.plans.tiers import ideal_tier, route_tier
from signalk_parquet_spark.plans.timerange import resolve_resolution_ms, resolve_time_range

UTC = timezone.utc
NOW = datetime(2024, 6, 1, 12, 0, 0, tzinfo=UTC)


def test_spec_plain():
    s = parse_path_spec("navigation.speedOverGround")
    assert s.path == "navigation.speedOverGround"
    assert s.method == "average" and s.smoothing is None and s.source_ref is None


def test_spec_method_and_source():
    s = parse_path_spec("navigation.speedOverGround:max|n2k-on-ve.can0.115")
    assert s.method == "max" and s.source_ref == "n2k-on-ve.can0.115"


def test_spec_official_smoothing_syntax():
    s = parse_path_spec("environment.wind.speedApparent:sma:5")
    assert s.smoothing == "sma" and s.smoothing_window == 5 and s.smoothing_only


def test_spec_extension_smoothing_syntax():
    s = parse_path_spec("environment.wind.speedApparent:average:ema:10")
    assert s.method == "average" and s.smoothing == "ema" and not s.smoothing_only


def test_paths_param_sanitized_and_split():
    specs = parse_paths_param("a.b:min,c.d:max")
    assert [s.path for s in specs] == ["a.b", "c.d"]
    assert [s.method for s in specs] == ["min", "max"]


def test_bad_spec_raises():
    with pytest.raises(ValueError):
        parse_path_spec("a.b:bogus_method")


# --- time ranges (the 5 reference patterns) ---------------------------------
def test_range_from_to():
    r = resolve_time_range("2024-06-01T00:00:00Z", "2024-06-01T06:00:00Z", now=NOW)
    assert r.span_ms == 6 * 3600 * 1000


def test_range_from_duration():
    r = resolve_time_range(from_iso="2024-06-01T00:00:00Z", duration="PT2H", now=NOW)
    assert r.to_ts.hour == 2


def test_range_duration_to():
    r = resolve_time_range(to_iso="2024-06-01T06:00:00Z", duration="1h", now=NOW)
    assert r.from_ts.hour == 5


def test_range_duration_only_ends_now():
    r = resolve_time_range(duration=3600, now=NOW)
    assert r.to_ts == NOW and r.from_ts.hour == 11


def test_range_default_last_hour():
    r = resolve_time_range(now=NOW)
    assert (r.to_ts - r.from_ts).total_seconds() == 3600


def test_default_resolution_500_buckets():
    r = resolve_time_range("2024-06-01T00:00:00Z", "2024-06-01T06:00:00Z", now=NOW)
    assert resolve_resolution_ms(r, None) == 6 * 3600 * 1000 // 500


# --- tier routing -------------------------------------------------------------
def test_ideal_tier_thresholds():
    assert ideal_tier(3_600_000) == "1h"
    assert ideal_tier(60_000) == "60s"
    assert ideal_tier(5_000) == "5s"
    assert ideal_tier(4_999) == "raw"


def test_route_falls_through_to_existing():
    s = parse_path_spec("a.b")
    assert route_tier(s, 3_600_000, {"raw", "5s"}) == "5s"
    assert route_tier(s, 3_600_000, {"raw", "5s", "1h"}) == "1h"


def test_route_overrides_to_raw():
    assert route_tier(parse_path_spec("a.b|src1"), 3_600_000, {"1h", "raw"}) == "raw"
    assert route_tier(parse_path_spec("name"), 3_600_000, {"1h", "raw"}) == "raw"  # string path
    s = parse_path_spec("a.b")
    assert route_tier(s, 3_600_000, {"1h", "raw"}, is_object_path=True) == "raw"
    assert route_tier(s, 3_600_000, {"1h", "raw"}, skip_aggregation=True) == "raw"


def test_spec_ema_alpha_param():
    """path:ema:0.3 carries α to the smoother (HistoryAPI.ts:2061-2063:
    request param wins, else defaultEmaAlpha)."""
    s = parse_path_spec("environment.wind.speedApparent:ema:0.3")
    assert s.smoothing == "ema" and s.smoothing_param == 0.3 and s.ema_alpha == 0.3
    assert s.smoothing_only
    assert s.column_name == "environment.wind.speedApparent:ema0.3"
    # default α when no param given
    assert parse_path_spec("a.b:ema").ema_alpha == 0.2
    # extension syntax: explicit method + parameterized ema
    s2 = parse_path_spec("a.b:max:ema:0.5")
    assert s2.method == "max" and s2.ema_alpha == 0.5 and not s2.smoothing_only
