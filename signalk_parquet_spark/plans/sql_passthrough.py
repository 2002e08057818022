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


#: SignalK paths whose value is a JSON OBJECT (position/attitude/...) — the
#: reference's jsonPatterns list (claude-analyzer.ts:3307-3329)
_JSON_OBJECT_PATH = re.compile(r"\b\w+\.(position|attitude|coordinate)\b", re.IGNORECASE)
#: standalone `value` (not value_json / value_latitude / ...), the
#: reference's negative-lookahead replace (claude-analyzer.ts:3337)
_BARE_VALUE = re.compile(r"\bvalue\b(?!_|\w)", re.IGNORECASE)
#: a dotted SignalK path mentioned in the SQL text (bare or quoted)
_DOTTED_PATH = re.compile(r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)+")


def correct_column_usage(sql: str, paths: list[str] | None = None) -> str:
    """The reference's value/value_json auto-correct
    (claude-analyzer.ts:3307-3340): queries touching JSON-object paths
    (navigation.position, *.attitude, *.coordinate) almost always mean the
    object column, so standalone `value` references are rewritten to
    `value_json`.

    The rewrite is textual and hits EVERY bare `value` in the statement, so
    it only fires when every SignalK path the query touches is an object
    path (``paths`` — pass the discovered/explicit path list): a query
    joining navigation.position with a scalar path like
    navigation.speedOverGround must keep the scalar side's `value` intact,
    otherwise it silently reads the scalar series' all-null value_json.
    With no path list (standalone use) the original whole-text heuristic
    applies — callers that mix object and scalar paths should pass paths."""
    if paths is not None:
        if paths and all(_JSON_OBJECT_PATH.search(p) for p in paths):
            return _BARE_VALUE.sub("value_json", sql)
        return sql
    if _JSON_OBJECT_PATH.search(sql):
        return _BARE_VALUE.sub("value_json", sql)
    return sql


def discover_signalk_paths(lake: Lake, sql: str) -> list[str]:
    """SignalK paths mentioned in the SQL that actually exist in the lake —
    so callers can query `navigation.speedOverGround` by name without
    pre-registering views (the reference rewrites paths into file globs the
    same way, claude-analyzer.ts executeSQLQuery path handling)."""
    known = set(lake.discover_paths())
    return sorted({m for m in _DOTTED_PATH.findall(sql) if m in known})


def register_path_views(lake: Lake, paths: list[str], tier: str = "raw") -> list[str]:
    """CREATE OR REPLACE TEMP VIEW <sanitized path> AS <pruned lake read>."""
    names = []
    for p in paths:
        name = sanitize_path(p)
        lake.read(tier=tier, path=p).createOrReplaceTempView(name)
        names.append(name)
    return names


def run_readonly_sql(
    lake: Lake, sql: str, paths: list[str] | None = None, tier: str = "raw"
) -> DataFrame:
    """Validate → resolve SignalK path names → auto-correct columns (scoped
    to the discovered paths) → spark.sql. ``paths=None`` auto-discovers the
    paths the SQL mentions."""
    validate_readonly_sql(sql)
    if paths is None:
        paths = discover_signalk_paths(lake, sql)
    sql = correct_column_usage(sql, paths)
    register_path_views(lake, paths, tier)
    # rewrite dotted SignalK path names to the registered view names
    for p in sorted(paths, key=len, reverse=True):
        sql = sql.replace(f'"{p}"', sanitize_path(p)).replace(p, sanitize_path(p))
    return lake.spark.sql(sql)
