"""Differential comparison harness: runs every registered Spark query and its
DuckDB oracle side-by-side and compares (row count, column names, values) —
a local replica of the driver's correctness gate (SURVEY §5: differential
testing vs a DuckDB oracle)."""

from __future__ import annotations

import datetime
import math
from decimal import Decimal
from typing import Any

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v: Any) -> Any:
    # Deliberately NOT coercing Decimal: DuckDB HUGEINT/DECIMAL surfaces as
    # Decimal here and as decimal128 in the driver's Arrow hash — a Decimal
    # vs int/float pair must FAIL locally exactly like it fails at the
    # driver (the r03 sessionize_30m window-sum lesson, CLAUDE.md rule 6).
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%dT%H:%M:%SZ")
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _key(row: tuple) -> tuple:
    return tuple((x is None, str(type(x)), x) for x in row)


def normalize_result(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=_key)
    return sorted_cols, out


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    sc, sr = normalize_result(s_cols, s_rows)
    dc, dr = normalize_result(d_cols, d_rows)
    if sc != dc:
        problems.append(f"{name}: column mismatch spark={sc} duckdb={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"{name}: row count spark={len(sr)} duckdb={len(dr)}")
    n_bad = 0
    for a, b in zip(sr, dr):
        if a != b:
            n_bad += 1
            if n_bad <= 5:
                diff_cols = [
                    (sc[i], a[i], b[i]) for i in range(len(a)) if a[i] != b[i]
                ]
                problems.append(f"{name}: value mismatch {diff_cols}")
    if n_bad > 5:
        problems.append(f"{name}: ... {n_bad} mismatching rows total of {len(sr)}")
    return problems
