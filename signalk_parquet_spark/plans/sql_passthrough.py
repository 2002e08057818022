"""Raw read-only SQL passthrough (SURVEY §2.1 S12) — the reference's
/api/query endpoint (api-routes.ts:447-541): arbitrary analytical SQL over
the store, restricted to SELECT/WITH with a mutation-keyword blocklist, and
SignalK path names rewritten to the physical relations.

Spark form: register each (context, path) series as a temp view named by the
sanitized path, then spark.sql(). Catalyst plans it; partition pruning still
applies because the views are filtered reads of the partitioned lake.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from ..sources.hive_paths import sanitize_path
from ..sources.lake import Lake

#: the reference's keyword blocklist (api-routes.ts:483-500 equivalent)
_FORBIDDEN = re.compile(
    r"\b(insert|update|delete|drop|create|alter|attach|copy|pragma|grant|set|merge|truncate|call)\b",
    re.IGNORECASE,
)


def validate_readonly_sql(sql: str) -> None:
    stripped = sql.strip().rstrip(";")
    if ";" in stripped:
        raise ValueError("multiple statements are not allowed")
    if not re.match(r"^\s*(select|with)\b", stripped, re.IGNORECASE):
        raise ValueError("only SELECT/WITH queries are allowed")
    m = _FORBIDDEN.search(stripped)
    if m:
        raise ValueError(f"forbidden keyword in read-only SQL: {m.group(0)}")


def register_path_views(lake: Lake, paths: list[str], tier: str = "raw") -> list[str]:
    """CREATE OR REPLACE TEMP VIEW <sanitized path> AS <pruned lake read>."""
    names = []
    for p in paths:
        name = sanitize_path(p)
        lake.read(tier=tier, path=p).createOrReplaceTempView(name)
        names.append(name)
    return names


def run_readonly_sql(lake: Lake, sql: str, paths: list[str], tier: str = "raw") -> DataFrame:
    validate_readonly_sql(sql)
    register_path_views(lake, paths, tier)
    # rewrite dotted SignalK path names to the registered view names
    for p in sorted(paths, key=len, reverse=True):
        sql = sql.replace(f'"{p}"', sanitize_path(p)).replace(p, sanitize_path(p))
    return lake.spark.sql(sql)
