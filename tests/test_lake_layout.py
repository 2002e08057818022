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
