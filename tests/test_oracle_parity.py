"""The correctness gate, locally: every registered query must match its
DuckDB oracle on sf0.01 (row count + column names + exact normalized values).
This mirrors what the driver records in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

from signalk_parquet_spark import registry
from tests.oracle_compare import compare, duckdb_conn


def _params():
    names = sorted(registry.queries().keys())
    return names


@pytest.fixture(scope="module")
def con(sf_oracle):
    c = duckdb_conn(sf_oracle)
    yield c
    c.close()


@pytest.mark.parametrize("name", _params())
def test_query_matches_oracle(name, spark, sf_oracle, con):
    fn = registry.queries()[name]
    sql = registry.oracle_sql().get(name)
    df = fn(spark, sf_oracle)
    if sql is None:
        # weaker rows-only check, like the driver
        assert df.count() >= 0
        return
    problems = compare(name, df, con, sql)
    assert not problems, "\n".join(problems)
