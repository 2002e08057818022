"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers here as
  name -> (spark_fn(spark, sf_dir) -> DataFrame, duckdb_oracle_sql | None)
The oracle SQL runs against DuckDB views named after the parquet tables
(region nation customer supplier part orders lineitem events documents
embeddings). Column names and rounding are aligned on both sides so the
driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


_NANO_COLS_CACHE: dict[str, list[str]] = {}


def _nano_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't read those
    natively, so we read them as long (nanosAsLong) and convert."""
    if path not in _NANO_COLS_CACHE:
        import pyarrow.dataset as ds
        import pyarrow.types as pat

        schema = ds.dataset(path).schema
        _NANO_COLS_CACHE[path] = [
            f.name for f in schema if pat.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    return _NANO_COLS_CACHE[path]


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .session import ensure_query_confs

    ensure_query_confs(spark)
    path = f"{sf_dir}/{table}.parquet"
    df = spark.read.parquet(path)
    for c in _nano_timestamp_cols(path):
        # integer ns -> µs truncation, matching DuckDB's ns->µs read behavior
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def dd_bucket(resolution_ms: int, ts: str = "ts") -> str:
    """DuckDB expression equal to functions.time.bucket_iso — the reference's
    bucket rendering (src/HistoryAPI.ts:1776-1777)."""
    return (
        f"strftime(epoch_ms(CAST(floor(epoch_ms({ts})/{resolution_ms})*{resolution_ms} AS BIGINT)), "
        f"'%Y-%m-%dT%H:%M:%SZ')"
    )


def queries() -> dict[str, QueryFn]:
    _import_all()
    return {k: v[0] for k, v in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _import_all()
    return {k: v[1] for k, v in REGISTRY.items() if v[1] is not None}


def _import_all() -> None:
    from . import queries_core, queries_tpch  # noqa: F401

    for mod in ("queries_spatial", "queries_text", "queries_similarity", "queries_dedup"):
        try:
            __import__(f"{__package__}.{mod}")
        except ImportError:
            pass
