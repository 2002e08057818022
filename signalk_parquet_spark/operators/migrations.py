"""One-time maintenance migrations (SURVEY §2.10): vector-averaging
backfill and position re-aggregation, both with dry-run — plus query-driven
path auto-discovery.

Reference: vector-averaging migration re-aggregates all angular paths' tier
files to add sin/cos columns (api-routes.ts:5231-5371); position
re-aggregation rebuilds position tiers with outlier rejection and supports
dryRun (api-routes.ts:5427-5615); auto-discovery adds a path config the
first time a query asks for an unconfigured path (auto-discovery.ts,
HistoryAPI.ts:1015-1056).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import functions as F

from ..schema import is_position_path
from ..sources.lake import Lake
from .rollup import rollup_angular, rollup_position


def migrate_vector_averaging(
    lake: Lake, angular_paths: list[str], tiers: tuple[str, ...] = ("5s", "60s", "1h"), dry_run: bool = False
) -> dict[str, int]:
    """Rebuild angular paths' tier files from raw so they carry
    value_sin_avg/value_cos_avg partial state. Returns rows written per tier."""
    written: dict[str, int] = {}
    for tier in tiers:
        total = 0
        for path in angular_paths:
            raw = lake.read(tier="raw", path=path)
            rolled = rollup_angular(raw, tier)
            total += rolled.count()
            if not dry_run:
                lake.write_rollup(rolled.withColumn("context", F.col("context")), tier)
        written[tier] = total
    return written


def migrate_position_reaggregation(
    lake: Lake, position_paths: list[str] | None = None, tiers: tuple[str, ...] = ("5s", "60s", "1h"), dry_run: bool = False
) -> dict[str, int]:
    """Rebuild position tiers with GPS-outlier-aware representative points
    (A12). ``dry_run`` counts what would be written without touching disk."""
    paths = position_paths or [p for p in lake.discover_paths() if is_position_path(p)]
    written: dict[str, int] = {}
    for tier in tiers:
        total = 0
        for path in paths:
            raw = lake.read(tier="raw", path=path)
            rolled = rollup_position(raw, tier)
            total += rolled.count()
            if not dry_run:
                lake.write_rollup(rolled, tier)
        written[tier] = total
    return written


def migrate_rollup_epoch(lake: Lake, tiers: list[str] | None = None, dry_run: bool = False) -> dict[str, int]:
    """Flat→epoch layout migration for rollup tiers written before the
    uniform-depth rule (Lake.write_rollup now always adds a trailing
    epoch=<id> level; pre-epoch tiers have 5 partition levels). A pre-epoch
    tier MUST be migrated before any new write lands in it: dynamic
    partition overwrite only replaces epoch=0 subtrees, so old 5-level leaf
    files would survive next to new 6-level ones and the mixed depth makes
    the whole tier unreadable (Conflicting partition column names — which
    Lake.read deliberately surfaces).

    Per tier: read the (still-uniform) old subtree, rewrite through
    write_rollup (lands under epoch=0), then delete the old epoch-less leaf
    files — the same read-rewrite-swap shape as migrate_hive_layout.
    Local roots only (os.walk/os.remove); an object-store lake would swap
    via the store's batch-delete API instead."""
    import os

    root = lake.roots[0]
    if tiers is None:
        tiers = [
            d.split("tier=", 1)[1]
            for d in (lake._tier_dirs(root))
            if not d.endswith("tier=raw")
        ]
    migrated: dict[str, int] = {}
    for tier in tiers:
        local = f"{root}/tier={tier}".removeprefix("file:")
        # pre-epoch leaf files sit directly under day=*/ with no epoch= level
        old_files = [
            os.path.join(dirpath, f)
            for dirpath, dirnames, files in os.walk(local)
            if os.path.basename(dirpath).startswith("day=")
            for f in files
            if f.endswith(".parquet")
        ]
        if not old_files:
            migrated[tier] = 0
            continue
        df = lake.read(tier=tier)  # uniform 5-level read still works pre-write
        n = df.count()
        if not dry_run:
            rows = df.select(
                *[c for c in df.columns if c not in ("tier", "year", "day", "epoch")]
            )
            lake.write_rollup(rows, tier)
            for f in old_files:
                os.remove(f)
        migrated[tier] = n
    return migrated


@dataclass
class AutoDiscovery:
    """Query-driven path configuration: the first query against an
    unconfigured path auto-registers it (capped), honoring include/exclude
    globs — pure config-layer bookkeeping."""

    include: list[str] = field(default_factory=lambda: ["*"])
    exclude: list[str] = field(default_factory=list)
    cap: int = 100
    configured: set[str] = field(default_factory=set)

    def check(self, path: str) -> bool:
        """True if the path is (now) configured; registers it when allowed."""
        import fnmatch

        if path in self.configured:
            return True
        if len(self.configured) >= self.cap:
            return False
        if any(fnmatch.fnmatch(path, pat) for pat in self.exclude):
            return False
        if not any(fnmatch.fnmatch(path, pat) for pat in self.include):
            return False
        self.configured.add(path)
        return True
