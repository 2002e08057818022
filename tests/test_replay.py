"""Historical replay (streaming/replay.py): schedule semantics and the
driver-side pacer, clock injected so nothing actually sleeps."""

from __future__ import annotations

from signalk_parquet_spark.streaming.replay import (
    as_delta,
    emission_schedule,
    replay,
)


def _wide(spark):
    # two series over four buckets, with one hole per series (pivot nulls)
    rows = [
        ("2024-01-01T00:00:00Z", 1.0, None),
        ("2024-01-01T01:00:00Z", 2.0, 20.0),
        ("2024-01-01T02:00:00Z", None, 30.0),
        ("2024-01-01T03:00:00Z", 4.0, 40.0),
    ]
    return spark.createDataFrame(
        rows, "bucket_ts string, `nav.speed` double, `env.wind` double"
    )


def test_schedule_orders_batches_and_drops_nulls(spark):
    sched = emission_schedule(_wide(spark), batch_points=2).collect()
    assert [r["seq"] for r in sched] == list(range(6))  # 8 cells - 2 nulls
    # (ts, path) total order: wind sorts after speed within a bucket
    assert [(r["ts"][11:13], r["path"]) for r in sched] == [
        ("00", "nav.speed"),
        ("01", "env.wind"),
        ("01", "nav.speed"),
        ("02", "env.wind"),
        ("03", "env.wind"),
        ("03", "nav.speed"),
    ]
    assert [r["batch_idx"] for r in sched] == [0, 0, 1, 1, 2, 2]


def test_replay_fixed_tick_paces_between_batches(spark):
    sched = emission_schedule(_wide(spark), batch_points=2)
    waits, out = [], []
    n = replay(sched, out.append, tick_s=0.1, sleep=waits.append, context="self")
    assert n == len(out) == 6
    assert waits == [0.1, 0.1]  # one tick between each of the 3 batches
    # reference delta wire shape (historical-streaming.ts:199-213)
    d = out[0]
    assert d == as_delta(
        "2024-01-01T00:00:00Z", "nav.speed", 1.0, "self",
        "signalk-parquet-historical",
    )
    assert d["updates"][0]["$source"] == "signalk-parquet-historical"


def test_replay_event_time_pacing_scales_gaps(spark):
    sched = emission_schedule(_wide(spark), batch_points=2)
    from datetime import datetime, timezone

    def parse(ts: str) -> float:
        return datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        ).timestamp()

    waits = []
    n = replay(sched, lambda d: None, speed=3600.0, sleep=waits.append, parse_ts=parse)
    assert n == 6
    # distinct-ts gaps are 1h each; at speed 3600 each sleeps 1s; same-ts
    # points (two per bucket where both series exist) sleep nothing
    assert [round(w, 6) for w in waits] == [1.0, 1.0, 1.0]


def test_string_series_replay_type_faithfully(spark):
    """value_text series (e.g. navigation.state) must replay as strings —
    decided by COLUMN type, so a numeric-looking string stays a string
    (code-review finding: the double-cast melt dropped them all)."""
    wide = spark.createDataFrame(
        [
            ("2024-01-01T00:00:00Z", 5.5, "anchored"),
            ("2024-01-01T01:00:00Z", None, "3.5"),
            ("2024-01-01T02:00:00Z", 6.5, None),
        ],
        "bucket_ts string, `nav.speed` double, `nav.state` string",
    )
    out = []
    n = replay(emission_schedule(wide), out.append, sleep=lambda s: None)
    assert n == 4  # 6 cells - 2 nulls
    vals = {
        (d["updates"][0]["values"][0]["path"], d["updates"][0]["timestamp"][11:13]):
        d["updates"][0]["values"][0]["value"]
        for d in out
    }
    assert vals[("nav.state", "00")] == "anchored"
    assert vals[("nav.state", "01")] == "3.5"  # stays a string
    assert vals[("nav.speed", "00")] == 5.5
    assert vals[("nav.speed", "02")] == 6.5


def test_replay_accepts_plain_rows():
    rows = [
        {"batch_idx": 0, "seq": 0, "ts": 0.0, "path": "a", "value": 1.0},
        {"batch_idx": 0, "seq": 1, "ts": 10.0, "path": "a", "value": 2.0},
        {"batch_idx": 1, "seq": 2, "ts": 30.0, "path": "a", "value": 3.0},
    ]
    waits, out = [], []
    n = replay(rows, out.append, speed=10.0, sleep=waits.append)
    assert n == 3 and [r["updates"][0]["values"][0]["value"] for r in out] == [1.0, 2.0, 3.0]
    assert waits == [1.0, 2.0]
