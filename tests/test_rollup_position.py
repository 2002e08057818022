"""Crafted bucket-edge / duplicate-timestamp differentials pinning the
position rollup's reference-EXACT semantics (aggregation-service.ts:593-635),
resolving the three r7-verdict fidelity deltas in the reference's favor:

(a) neighbor lag/lead windows partition by (context, path, bucket_time) —
    legs never cross bucket boundaries, bucket-edge points get a trusted
    NULL neighbor (ts:603, 609);
(b) the representative-point rank prefers points at/after the bucket
    midpoint before |ts - midpoint| (ts:632-633);
(c) zero-dt legs are clamped to 1 ms (GREATEST(dt, 0.001), ts:611-612) so a
    duplicate-timestamp JUMP is a glitch while a duplicate-timestamp
    same-location pair stays trusted.

Each test is constructed so the pre-r8 formulation picks a DIFFERENT point,
so a regression to any of the three old behaviors fails here.
"""

from __future__ import annotations

from datetime import timedelta

import pytest

from signalk_parquet_spark.operators.rollup import rollup_position
from tests.records import T0, make_record, records_df


def _pos(ts, lat, lon=8.7, rid=None):
    v = {"latitude": lat, "longitude": lon}
    if rid is not None:
        v["rid"] = float(rid)
    return make_record(ts, "navigation.position", v)


def _reps(spark, rows, tier="5s", tiebreak=()):
    df = records_df(spark, rows)
    out = rollup_position(df, tier, tiebreak_cols=tiebreak)
    return {r["bucket_time"]: r for r in out.collect()}


def test_neighbor_legs_do_not_cross_bucket_boundaries(spark):
    # Bucket A [T0, T0+5s): a0 @+1s, a1 @+4s, 1e-5 deg apart (clean leg).
    # Bucket B [T0+5s, T0+10s): b0 @+6s jumps ~110 km from a1, b1 @+9s clean.
    # Reference scoping: the a1->b0 jump leg is INVISIBLE (different buckets);
    # a1 and b0 each get a trusted NULL edge, every point scores ok=2, and the
    # at/after-midpoint rule picks a1 (A) and b1 (B).
    # The old (context, path)-wide window would demote a1 and b0 as glitchy
    # and pick a0 for bucket A instead.
    rows = [
        _pos(T0 + timedelta(seconds=1), 47.5),
        _pos(T0 + timedelta(seconds=4), 47.5 + 1e-5),
        _pos(T0 + timedelta(seconds=6), 48.5),
        _pos(T0 + timedelta(seconds=9), 48.5 + 1e-5),
    ]
    reps = _reps(spark, rows)
    assert len(reps) == 2
    (bucket_a, bucket_b) = sorted(reps)
    assert reps[bucket_a]["value_latitude"] == pytest.approx(47.5 + 1e-5)
    assert reps[bucket_b]["value_latitude"] == pytest.approx(48.5 + 1e-5)


def test_rank_prefers_at_or_after_midpoint(spark):
    # Clean points at +2s and +3s: both 0.5 s from the midpoint (+2.5s).
    # Reference tiebreak CASE WHEN ts >= bucket_mid THEN 0 ELSE 1 -> +3s wins
    # (the old formulation broke the tie by ts -> +2s).
    rows = [
        _pos(T0 + timedelta(seconds=2), 47.5),
        _pos(T0 + timedelta(seconds=3), 47.5 + 1e-5),
    ]
    reps = _reps(spark, rows)
    (rep,) = reps.values()
    assert rep["value_latitude"] == pytest.approx(47.5 + 1e-5)


def test_duplicate_timestamp_jump_is_a_glitch(spark):
    # p0 @+1s clean; p1 @+3s clean; p2 @+3s (duplicate ts) ~110 km away.
    # GREATEST(dt, 0.001) makes the p1->p2 leg speed ~1.1e8 m/s -> both ends
    # lose that leg's trust: p0 scores 2, p1 and p2 score 1 -> p0 picked even
    # though p1/p2 sit nearer the midpoint. The old F.when(dt > 0) NULLed the
    # leg (score 0 for everyone) and picked p1.
    rows = [
        _pos(T0 + timedelta(seconds=1), 47.5, rid=0),
        _pos(T0 + timedelta(seconds=3), 47.5 + 1e-5, rid=1),
        _pos(T0 + timedelta(seconds=3), 48.5, rid=2),
    ]
    reps = _reps(spark, rows, tiebreak=("value_rid",))
    (rep,) = reps.values()
    assert rep["value_latitude"] == pytest.approx(47.5)
    assert rep["sample_count"] == 3


def test_duplicate_timestamp_same_location_stays_trusted(spark):
    # v0 @+0.5s ~11 m away (clean leg, before midpoint); v1/v2 @+3s duplicate
    # ts at the SAME location: dist 0 / 0.001 s = 0 m/s <= 25 -> trusted.
    # All score ok=2; v1/v2 are at/after the midpoint so one of them wins
    # (rid tiebreak -> v1). A regression that treats every zero-dt leg as a
    # glitch would demote v1/v2 to ok=1 and pick v0 (47.5001) instead.
    rows = [
        _pos(T0 + timedelta(seconds=0, milliseconds=500), 47.5001, rid=0),
        _pos(T0 + timedelta(seconds=3), 47.5, rid=1),
        _pos(T0 + timedelta(seconds=3), 47.5, rid=2),
    ]
    reps = _reps(spark, rows, tiebreak=("value_rid",))
    (rep,) = reps.values()
    assert rep["value_latitude"] == pytest.approx(47.5)
