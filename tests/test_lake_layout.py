"""Partition-depth uniformity across tiers (round-2 advice, high).

Raw is 5 partition levels; rollup tiers carry a trailing epoch level (6).
Spark's partition discovery raises 'Conflicting partition column names' if
one discovery spans both depths — these tests pin the two defenses:
batch rollup writes get epoch=0 (so batch+streaming never mix depths inside
one tier), and tier=None reads enumerate tier subtrees instead of tier=*.
"""

from __future__ import annotations

import glob

import pytest

from signalk_parquet_spark.operators.rollup import rollup_scalar
from signalk_parquet_spark.sources.lake import Lake
from tests.records import T0, records_df, scalar_series


@pytest.fixture(scope="module")
def mixed_lake(spark, tmp_path_factory):
    """One root holding raw (5 levels), a batch-written 5s rollup (epoch=0),
    and a streaming-style 60s rollup (epoch=7) — the exact mix that used to
    make tier=None discovery silently return empty."""
    root = str(tmp_path_factory.mktemp("mixed_lake"))
    lk = Lake(spark, root)
    raw = records_df(spark, scalar_series(T0, [4.0, 5.0, 6.0, 7.0, 8.0]))
    lk.write_records(raw, tier="raw")
    lk.write_rollup(rollup_scalar(lk.read(tier="raw"), "5s"), tier="5s")  # batch: epoch=0
    lk.write_rollup(rollup_scalar(lk.read(tier="raw"), "60s"), tier="60s", epoch=7)
    return lk


def test_batch_rollup_writes_epoch0(mixed_lake):
    files = glob.glob(
        f"{mixed_lake.roots[0]}/tier=5s/context=*/path=*/year=*/day=*/epoch=0/*.parquet"
    )
    assert files, "batch rollup must land under epoch=0 for uniform tier depth"


def test_tier_none_read_spans_mixed_depths(mixed_lake):
    # the old tier=* discovery raised Conflicting-partition-column-names here
    # and the blanket except turned that into an empty relation
    df = mixed_lake.read()
    tiers = {r[0] for r in df.select("tier").distinct().collect()}
    assert tiers == {"raw", "5s", "60s"}
    assert df.filter(df.tier == "raw").count() == 5


def test_discovery_sees_all_tiers(mixed_lake):
    assert mixed_lake.discover_contexts() == ["vessels.test:self"]
    assert "navigation.speedOverGround" in mixed_lake.discover_paths()


def test_epoch_never_hides_rollup_rows(mixed_lake):
    # a tier written under a nonzero epoch reads back whole
    assert mixed_lake.read(tier="60s").count() == mixed_lake.read(tier="5s").count()


def test_conflicting_layout_surfaces(spark, tmp_path):
    """A genuinely malformed tier (mixed depths INSIDE one tier) must raise,
    not silently skip the root."""
    root = tmp_path / "bad_lake"
    base = root / "tier=5s/context=c/path=p/year=2024"
    df = spark.range(1).selectExpr("1.0 as v")
    df.write.parquet(str(base / "day=153"))
    df.write.parquet(str(base / "day=154/epoch=1"))
    lk = Lake(spark, str(root))
    with pytest.raises(Exception, match="(?i)conflicting"):
        lk.read(tier="5s").count()


def test_unreachable_root_degrades_to_local(spark, tmp_path):
    """Hybrid→local fallback: a root whose filesystem can't even be
    constructed (no s3a jars here) must not sink the healthy roots —
    but layout conflicts under a REACHABLE root still raise (see
    test_conflicting_layout_surfaces)."""
    root = str(tmp_path / "lake")
    lk = Lake(spark, root, "s3a://no-such-bucket-anywhere/lake")
    raw = records_df(spark, scalar_series(T0, [1.0, 2.0, 3.0]))
    lk.write_records(raw, tier="raw")
    assert lk.read(tier="raw").count() == 3       # tier-scoped read
    assert lk.read().count() == 3                 # tier=None discovery read
    assert lk.discover_contexts() == ["vessels.test:self"]


def test_migrate_rollup_epoch_flat_to_epoch0(spark, tmp_path):
    """A pre-uniform-depth lake (rollup leaves directly under day=, no epoch
    level) migrates to epoch=0 layout: same rows, old leaves gone, tier
    readable again alongside new-format writes."""
    import os
    import shutil

    from signalk_parquet_spark.operators.migrations import migrate_rollup_epoch

    root = str(tmp_path / "old_lake")
    lk = Lake(spark, root)
    raw = records_df(spark, scalar_series(T0, [4.0, 5.0, 6.0, 7.0, 8.0]))
    lk.write_records(raw, tier="raw")
    lk.write_rollup(rollup_scalar(lk.read(tier="raw"), "5s"), tier="5s")
    n_before = lk.read(tier="5s").count()
    # devolve to the pre-epoch layout: hoist files out of epoch=0/
    for dirpath, dirnames, files in os.walk(root):
        if os.path.basename(dirpath) == "epoch=0":
            for f in files:
                if f.endswith(".parquet"):
                    shutil.move(os.path.join(dirpath, f), os.path.join(os.path.dirname(dirpath), f))
    for dirpath, dirnames, _ in list(os.walk(root, topdown=False)):
        if os.path.basename(dirpath) == "epoch=0":
            shutil.rmtree(dirpath)
    assert lk.read(tier="5s").count() == n_before  # old layout still uniform

    dry = migrate_rollup_epoch(lk, dry_run=True)
    assert dry["5s"] == n_before
    got = migrate_rollup_epoch(lk)
    assert got["5s"] == n_before
    # old leaves gone, everything under epoch=0 again
    stray = [
        os.path.join(d, f)
        for d, _, fs in os.walk(f"{root}/tier=5s")
        if os.path.basename(d).startswith("day=")
        for f in fs
        if f.endswith(".parquet")
    ]
    assert stray == []
    assert lk.read(tier="5s").count() == n_before
    # a NEW write into the migrated tier keeps the tier readable (the exact
    # mixed-depth failure the migration exists to prevent)
    lk.write_rollup(rollup_scalar(lk.read(tier="raw"), "5s"), tier="5s")
    assert lk.read(tier="5s").count() == n_before
    assert migrate_rollup_epoch(lk)["5s"] == 0  # idempotent: nothing left to move


def _devolve_epoch0(root):
    """Hoist rollup leaves out of epoch=0/ — fabricates the pre-epoch layout."""
    import os
    import shutil

    for dirpath, _dirnames, files in os.walk(root):
        if os.path.basename(dirpath) == "epoch=0":
            for f in files:
                if f.endswith(".parquet"):
                    shutil.move(
                        os.path.join(dirpath, f),
                        os.path.join(os.path.dirname(dirpath), f),
                    )
    for dirpath, _dirnames, _ in list(os.walk(root, topdown=False)):
        if os.path.basename(dirpath) == "epoch=0":
            shutil.rmtree(dirpath)


def test_migrate_rollup_epoch_crash_resume(spark, tmp_path):
    """The migration's marker protocol must recover BOTH interruption points
    (r03 ADVICE: a crash between rewrite and old-leaf deletion stranded the
    tier mixed-depth and unrecoverable):
    - after the rewrite (done marker): re-run deletes the leftover flat
      leaves without re-reading the mixed tier;
    - during the rewrite (start marker): re-run scraps the partial epoch
      subtrees and redoes the tier from the still-intact flat leaves;
    - mixed depth with NO marker is foreign state and must raise."""
    import os

    import pytest

    from signalk_parquet_spark.operators.migrations import migrate_rollup_epoch

    root = str(tmp_path / "crash_lake")
    lk = Lake(spark, root)
    raw = records_df(spark, scalar_series(T0, [4.0, 5.0, 6.0, 7.0, 8.0]))
    lk.write_records(raw, tier="raw")
    lk.write_rollup(rollup_scalar(lk.read(tier="raw"), "5s"), tier="5s")
    n = lk.read(tier="5s").count()
    tier_dir = f"{root}/tier=5s"

    # --- crash AFTER the rewrite: epoch=0 written, flat leaves not yet
    # deleted, done marker present (the os.replace promote already ran)
    _devolve_epoch0(root)
    flat = migrate_rollup_epoch(lk, dry_run=True)  # sanity: purely flat now
    assert flat["5s"] == n
    # replay the migration's own first two steps by hand
    df = lk.read(tier="5s")
    rows = df.select(*[c for c in df.columns if c not in ("tier", "year", "day", "epoch")])
    open(os.path.join(tier_dir, "_rollup_migrating"), "w").close()
    lk.write_rollup(rows, tier="5s")
    os.replace(
        os.path.join(tier_dir, "_rollup_migrating"),
        os.path.join(tier_dir, "_rollup_migrated"),
    )
    # "crash" here; re-run resumes by deleting flat leaves only
    got = migrate_rollup_epoch(lk)
    assert got["5s"] == n
    assert lk.read(tier="5s").count() == n
    assert not os.path.exists(os.path.join(tier_dir, "_rollup_migrated"))

    def _fresh_rows():
        # re-derive from the CURRENT flat leaves — a plan captured before a
        # migration run references files that run deleted
        df = lk.read(tier="5s")
        return df.select(
            *[c for c in df.columns if c not in ("tier", "year", "day", "epoch")]
        )

    # --- crash DURING the rewrite: partial epoch=0 beside flat leaves,
    # start marker present → scrapped and redone from the flat leaves
    _devolve_epoch0(root)
    partial = _fresh_rows().limit(1).collect()
    open(os.path.join(tier_dir, "_rollup_migrating"), "w").close()
    lk.write_rollup(spark.createDataFrame(partial), tier="5s")  # a partial write
    got = migrate_rollup_epoch(lk)
    assert got["5s"] == n
    assert lk.read(tier="5s").count() == n

    # --- mixed depth with no marker: refuse to guess
    _devolve_epoch0(root)
    partial = _fresh_rows().limit(1).collect()
    lk.write_rollup(spark.createDataFrame(partial), tier="5s")
    with pytest.raises(RuntimeError, match="without a migration"):
        migrate_rollup_epoch(lk)


# --- r9: line-format ingestion sources (sources/formats.py) -----------------------


def test_jsonl_records_and_quarantine(spark, tmp_path):
    import json

    from signalk_parquet_spark.sources.formats import (
        quarantined_lines,
        read_jsonl_raw,
        read_jsonl_records,
    )

    p = tmp_path / "feed.jsonl"
    good = [
        {"ts": "2024-07-01T06:00:00Z", "context": "vessels.a",
         "path": "navigation.speedOverGround", "value": 5.25,
         "value_text": None, "source_label": "exp"},
        {"ts": "2024-07-01T06:00:20Z", "context": "vessels.a",
         "path": "navigation.state", "value": None,
         "value_text": "sailing", "source_label": "exp"},
    ]
    lines = [json.dumps(g) for g in good]
    lines.insert(1, '{"ts": "2024-07-01T06:00:10Z", "value": "NaNope"}')  # type mismatch
    lines.append("{not json")
    lines.append('{"context": "vessels.a", "path": "x", "value": 1.0}')  # no ts
    p.write_text("\n".join(lines) + "\n")

    recs = read_jsonl_records(spark, str(p)).collect()
    assert len(recs) == 2
    by_path = {r["path"]: r for r in recs}
    assert by_path["navigation.speedOverGround"]["value"] == 5.25
    assert by_path["navigation.state"]["value_text"] == "sailing"
    assert by_path["navigation.state"]["source"] == '{"label":"exp"}'
    assert by_path["navigation.state"]["signalk_timestamp"].second == 20
    # the two malformed lines are quarantined, never silently dropped
    q = quarantined_lines(read_jsonl_raw(spark, str(p))).collect()
    assert len(q) == 2


def test_csv_records(spark, tmp_path):
    from signalk_parquet_spark.sources.formats import read_csv_records

    p = tmp_path / "feed.csv"
    p.write_text(
        "ts,context,path,value,value_text,source_label\n"
        "2024-07-01T06:00:00Z,vessels.a,navigation.speedOverGround,5.25,,exp\n"
        "2024-07-01T06:00:20Z,vessels.a,navigation.state,,sailing,exp\n"
    )
    recs = read_csv_records(spark, str(p)).orderBy("signalk_timestamp").collect()
    assert [r["path"] for r in recs] == [
        "navigation.speedOverGround", "navigation.state"
    ]
    assert recs[0]["value"] == 5.25 and recs[1]["value_text"] == "sailing"


def test_jsonl_records_feed_the_lake(spark, tmp_path):
    """The imported records must be lake-writable like live records."""
    import json

    from signalk_parquet_spark.sources.formats import read_jsonl_records
    from signalk_parquet_spark.sources.lake import Lake

    p = tmp_path / "feed.jsonl"
    p.write_text(json.dumps({
        "ts": "2024-07-01T06:00:00Z", "context": "vessels.a",
        "path": "navigation.speedOverGround", "value": 5.25,
        "value_text": None, "source_label": "exp",
    }) + "\n")
    lake = Lake(spark, str(tmp_path / "lake"))
    lake.write_records(read_jsonl_records(spark, str(p)), tier="raw")
    back = lake.read(tier="raw").collect()
    assert len(back) == 1 and back[0]["value"] == 5.25
