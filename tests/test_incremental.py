"""Incremental tier maintenance (operators/incremental.py): late-arriving
rows must trigger a recompute of exactly the touched (context, path, day)
partitions — equal to a full recompute in content, and provably NOT
rewriting untouched partitions (the 100 TB property)."""

import os
from datetime import datetime, timedelta, timezone

import pytest

from signalk_parquet_spark.operators.incremental import (
    full_equals_incremental,
    merge_tier,
    rollup_incremental,
    scope_to_touched,
    touched_buckets,
)
from signalk_parquet_spark.operators.rollup import rollup_scalar
from signalk_parquet_spark.sources.lake import Lake

from tests.records import make_record, records_df

T0 = datetime(2024, 3, 10, 0, 30, tzinfo=timezone.utc)
PATH = "environment.wind.speedApparent"


def _mk_rows(ctx: str, day_offset: int, n: int, base_v: float) -> list[dict]:
    start = T0 + timedelta(days=day_offset)
    return [
        make_record(start + timedelta(minutes=17 * i), PATH, base_v + 0.25 * i, context=ctx)
        for i in range(n)
    ]


def _partition_mtimes(root: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


@pytest.fixture
def lake_with_late(spark, tmp_path):
    lake = Lake(spark, str(tmp_path / "lake"))
    on_time = (
        _mk_rows("vessels.a", 0, 40, 5.0)
        + _mk_rows("vessels.a", 1, 40, 6.0)
        + _mk_rows("vessels.b", 0, 40, 7.0)
        + _mk_rows("vessels.b", 1, 40, 8.0)
    )
    # late rows: vessel A, day 0 ONLY — exactly one (context, path, day)
    # partition should be touched
    late = [
        make_record(T0 + timedelta(hours=3, minutes=7 * i), PATH, 99.0 + i, context="vessels.a")
        for i in range(5)
    ]
    lake.write_records(records_df(spark, on_time), tier="raw")
    lake.write_rollup(rollup_scalar(lake.read(tier="raw").drop("tier", "year", "day"), "1h"), "1h")
    # the late rows arrive: exported to raw (the buffer watermark step)
    late_df = records_df(spark, late)
    lake.write_records(late_df, tier="raw", mode="append")
    return lake, late_df, tmp_path


def test_incremental_equals_full_recompute(spark, lake_with_late):
    lake, late_df, tmp_path = lake_with_late
    n = rollup_incremental(lake, late_df, "1h")
    assert n == 1  # one touched (context, path, day)
    all_raw = lake.read(tier="raw").drop("tier", "year", "day")
    assert full_equals_incremental(spark, lake, "1h", all_raw)


def test_untouched_partitions_not_rewritten(spark, lake_with_late):
    lake, late_df, tmp_path = lake_with_late
    root = str(tmp_path / "lake")
    before = _partition_mtimes(root)
    rollup_incremental(lake, late_df, "1h")
    after = _partition_mtimes(root)
    # partition dirs carry the lake's sanitized names (dots -> __)
    touched_frag = os.path.join(
        "context=vessels__a", "path=environment__wind__speedApparent", "year=2024", "day=070"
    )
    untouched_tier_files = {
        k for k in before
        if k.startswith("tier=1h") and touched_frag not in k
    }
    assert untouched_tier_files  # the check must actually cover something
    for k in untouched_tier_files:
        assert after[k] == before[k], f"untouched partition rewritten: {k}"
    # and the touched tier partition WAS rewritten
    touched_files_after = {k for k in after if k.startswith("tier=1h") and touched_frag in k}
    assert touched_files_after
    assert any(k not in before or after[k] != before[k] for k in touched_files_after)


def test_no_late_rows_is_a_noop(spark, lake_with_late):
    lake, late_df, tmp_path = lake_with_late
    empty = late_df.limit(0)
    root = str(tmp_path / "lake")
    before = _partition_mtimes(root)
    assert rollup_incremental(lake, empty, "1h") == 0
    assert _partition_mtimes(root) == before


def test_bucket_level_merge_helpers(spark, lake_with_late):
    """The pure-DataFrame rungs the gate query uses: touched discovery,
    semi-join scoping, anti-join+union merge — equivalent to full recompute
    at bucket granularity."""
    lake, late_df, _ = lake_with_late
    H = 3_600_000
    all_raw = lake.read(tier="raw").drop("tier", "year", "day")
    base = all_raw.exceptAll(late_df.select(*all_raw.columns))
    keys = ("context", "path")
    initial = rollup_scalar(base, "1h")
    touched = touched_buckets(late_df, H, keys, iso=False)  # rollup_* key is bucket_time
    scoped = scope_to_touched(all_raw, touched, H, keys, "signalk_timestamp", iso=False)
    recomputed = rollup_scalar(scoped, "1h")
    merged = merge_tier(initial, recomputed, touched, [*keys, "bucket_time"])
    want = rollup_scalar(all_raw, "1h")
    assert merged.exceptAll(want).isEmpty() and want.exceptAll(merged).isEmpty()


# --- property: random late subsets, random widths --------------------------------
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),        # series id
            st.integers(min_value=0, max_value=48 * 60),  # minute offset
            st.integers(min_value=-1000, max_value=1000), # value in quarter-units
            st.booleans(),                                # arrives late?
        ),
        min_size=1, max_size=120,
    ),
    res_ms=st.sampled_from([60_000, 3_600_000]),
)
def test_incremental_merge_equals_full_property(spark, rows, res_ms):
    """For ANY split of rows into on-time/late and any bucket width, the
    incremental merge (initial-from-base + recompute-touched) equals the
    full recompute. Values are quarter-unit dyadics so float sums are
    order-independent and exceptAll is exact."""
    # split in PYTHON, not via a (ts, context) join — generated rows can
    # collide on that key with opposite flags, which a join would duplicate
    late_recs, base_recs = [], []
    for i, (s, m, v, late) in enumerate(rows):
        rec = make_record(
            T0 + timedelta(minutes=m, seconds=(i * 7) % 60),
            PATH,
            0.25 * v,
            context=f"vessels.s{s}",
        )
        (late_recs if late else base_recs).append(rec)
    seed = records_df(spark, late_recs or base_recs)
    late_df = records_df(spark, late_recs) if late_recs else seed.limit(0)
    base = records_df(spark, base_recs) if base_recs else seed.limit(0)
    df = base.unionByName(late_df)
    keys = ("context", "path")
    tier = {60_000: "60s", 3_600_000: "1h"}[res_ms]
    initial = rollup_scalar(base, tier)
    touched = touched_buckets(late_df, res_ms, keys, iso=False)
    scoped = scope_to_touched(df, touched, res_ms, keys, "signalk_timestamp", iso=False)
    merged = merge_tier(initial, rollup_scalar(scoped, tier), touched, [*keys, "bucket_time"])
    want = rollup_scalar(df, tier)
    assert merged.exceptAll(want).isEmpty() and want.exceptAll(merged).isEmpty()


# --- streaming maintenance: beyond-watermark stragglers ---------------------------


def test_streaming_incremental_maintenance(spark, tmp_path):
    """start_incremental_maintenance end to end: a late-arrival feed lands
    in the buffer, the touched DAY rebuilds buffer->raw (duplicate-collapse
    overwrite), the touched tier partition recomputes — and a full
    reprocess of the same feed (fresh checkpoint = worst-case replay)
    converges to the identical state."""
    from signalk_parquet_spark.schema import record_schema
    from signalk_parquet_spark.sources.buffer import HotBuffer
    from signalk_parquet_spark.streaming.ingest import start_incremental_maintenance

    lake = Lake(spark, str(tmp_path / "lake"))
    buffer = HotBuffer(spark, str(tmp_path / "hot"))
    on_time = _mk_rows("vessels.a", 0, 30, 5.0) + _mk_rows("vessels.b", 1, 30, 7.0)
    buffer.append(records_df(spark, on_time))
    buffer.export_day(lake, T0)
    buffer.export_day(lake, T0 + timedelta(days=1))
    lake.write_rollup(
        rollup_scalar(lake.read(tier="raw").drop("tier", "year", "day"), "1h"), "1h"
    )

    late = [
        make_record(T0 + timedelta(hours=4, minutes=3 * i), PATH, 50.0 + i,
                    context="vessels.a")
        for i in range(6)
    ]
    feed = str(tmp_path / "late_feed")
    records_df(spark, late).write.parquet(feed)
    schema = record_schema()

    def run(ckpt: str) -> None:
        q = start_incremental_maintenance(
            spark, feed, schema, buffer, lake, str(tmp_path / ckpt), tier="1h"
        )
        q.awaitTermination(120)

    run("ckpt1")
    all_rows = lake.read(tier="raw")
    assert all_rows.count() == len(on_time) + len(late)  # no dup, no loss
    assert full_equals_incremental(
        spark, lake, "1h", all_rows.drop("tier", "year", "day")
    )
    # worst-case replay: reprocess the whole feed under a fresh checkpoint
    run("ckpt2")
    again = lake.read(tier="raw")
    assert again.count() == len(on_time) + len(late)
    assert full_equals_incremental(
        spark, lake, "1h", again.drop("tier", "year", "day")
    )


def test_incremental_angular_equals_full_recompute(spark, tmp_path):
    """kind='angular' through the same lake path (r9 verdict Next #4):
    touched-partition rebuild with exact_partials must equal a
    from-scratch rollup_angular BIT-FOR-BIT — nano-integer sin/cos sums
    are summation-order-independent, so exceptAll equality is exact, not
    a float-margin accident."""
    from signalk_parquet_spark.operators.rollup import rollup_angular

    lake = Lake(spark, str(tmp_path / "alake"))
    on_time = (
        _mk_rows("vessels.a", 0, 40, 0.5)
        + _mk_rows("vessels.a", 1, 40, 1.5)
        + _mk_rows("vessels.b", 0, 40, 2.5)
    )
    late = [
        make_record(
            T0 + timedelta(hours=3, minutes=7 * i), PATH, 3.0 + 0.1 * i,
            context="vessels.a",
        )
        for i in range(5)
    ]
    lake.write_records(records_df(spark, on_time), tier="raw")
    lake.write_rollup(
        rollup_angular(
            lake.read(tier="raw").drop("tier", "year", "day"), "1h",
            exact_partials=True,
        ),
        "1h",
    )
    late_df = records_df(spark, late)
    lake.write_records(late_df, tier="raw", mode="append")
    n = rollup_incremental(
        lake, late_df, "1h", kind="angular",
        roll_kwargs={"exact_partials": True},
    )
    assert n == 1  # vessel a day 0 only
    all_raw = lake.read(tier="raw").drop("tier", "year", "day")
    want = rollup_angular(all_raw, "1h", exact_partials=True)
    got = lake.read(tier="1h").select(*want.columns)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()


def test_incremental_position_equals_full_recompute(spark, tmp_path):
    """kind='position' through the lake path — the third dispatch arm.
    The representative-point pick is a deterministic function of each
    bucket's row set (row_number over a total order; emitted lat/lon are
    input doubles verbatim, stats are counts/timestamps), so rebuilding
    only the touched partition must reproduce the full recompute exactly."""
    from signalk_parquet_spark.operators.rollup import rollup_position

    lake = Lake(spark, str(tmp_path / "plake"))

    def pos_rows(ctx, day_offset, n, lat0):
        start = T0 + timedelta(days=day_offset)
        return [
            make_record(
                start + timedelta(minutes=17 * i), "navigation.position",
                {"latitude": lat0 + 0.001 * i, "longitude": -70.0 + 0.002 * i},
                context=ctx,
            )
            for i in range(n)
        ]

    on_time = (
        pos_rows("vessels.a", 0, 40, 41.0)
        + pos_rows("vessels.a", 1, 40, 42.0)
        + pos_rows("vessels.b", 0, 40, 43.0)
    )
    late = [
        make_record(
            T0 + timedelta(hours=3, minutes=7 * i), "navigation.position",
            {"latitude": 41.5 + 0.001 * i, "longitude": -70.5},
            context="vessels.a",
        )
        for i in range(5)
    ]
    lake.write_records(records_df(spark, on_time), tier="raw")
    lake.write_rollup(
        rollup_position(lake.read(tier="raw").drop("tier", "year", "day"), "1h"),
        "1h",
    )
    late_df = records_df(spark, late)
    lake.write_records(late_df, tier="raw", mode="append")
    n = rollup_incremental(lake, late_df, "1h", kind="position")
    assert n == 1  # vessel a day 0 only
    all_raw = lake.read(tier="raw").drop("tier", "year", "day")
    want = rollup_position(all_raw, "1h")
    got = lake.read(tier="1h").select(*want.columns)
    assert got.exceptAll(want).isEmpty() and want.exceptAll(got).isEmpty()
