"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship History-API-shaped query on sf0.001.
queries()         — one entry per implemented operator from SURVEY.md §2,
                    registered in signalk_parquet_spark.registry.
oracle_sql()      — DuckDB-runnable ANSI SQL twin for each query (column
                    names and rounding aligned for the value-hash compare).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from signalk_parquet_spark import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-series time-aligned History values query (bucketed
    average per series, pivoted wide — SURVEY §3 entry point 1)."""
    return _registry.queries()["align_pivot_1h"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
