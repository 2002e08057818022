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
