"""Global shuffle rank (operators/ordering.global_shuffle_rank): exact
differential vs the single-window global row_number it replaces,
permutation totality (pos is exactly 1..N), layout invariance, salt
independence, and the plan-shape claim (hash exchange, never a range
exchange)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from signalk_parquet_spark.operators.ordering import global_shuffle_rank


def _df(spark, n: int, parts: int = 8):
    return spark.range(n, numPartitions=parts).select(
        F.col("id").alias("doc_id")
    )


def _py_truth(ids, salt: str) -> dict[int, int]:
    order = sorted(ids, key=lambda i: (hashlib.md5(f"{i}{salt}".encode()).hexdigest(), i))
    return {i: p + 1 for p, i in enumerate(order)}


def test_matches_global_window_and_python_truth(spark) -> None:
    df = _df(spark, 3000)
    got = {r["doc_id"]: r["pos"] for r in global_shuffle_rank(df, "doc_id").collect()}
    w = Window.orderBy(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("shuffle"))), "doc_id")
    want = {
        r["doc_id"]: r["pos"]
        for r in df.select("doc_id", F.row_number().over(w).cast("long").alias("pos")).collect()
    }
    assert got == want == _py_truth(range(3000), "shuffle")
    assert sorted(got.values()) == list(range(1, 3001))  # a true permutation


def test_layout_invariant_and_salt_varies(spark) -> None:
    ids = list(range(500))
    got1 = {r["doc_id"]: r["pos"] for r in global_shuffle_rank(_df(spark, 500, 1), "doc_id").collect()}
    got32 = {r["doc_id"]: r["pos"] for r in global_shuffle_rank(_df(spark, 500, 32), "doc_id").collect()}
    assert got1 == got32 == _py_truth(ids, "shuffle")
    epoch2 = {r["doc_id"]: r["pos"] for r in global_shuffle_rank(_df(spark, 500), "doc_id", salt="e2").collect()}
    assert epoch2 == _py_truth(ids, "e2")
    assert epoch2 != got1  # a different salt is an independent epoch order


def test_small_bucket_counts_and_null_ids(spark) -> None:
    # buckets=1 degenerates to one partition (still correct); nulls drop out
    df = spark.createDataFrame([(1,), (None,), (2,), (3,)], "doc_id long")
    got = {r["doc_id"]: r["pos"] for r in global_shuffle_rank(df, "doc_id", buckets=1).collect()}
    assert got == _py_truth([1, 2, 3], "shuffle")
    with pytest.raises(ValueError, match="buckets"):
        global_shuffle_rank(df, "doc_id", buckets=0)
    with pytest.raises(ValueError, match="buckets"):
        global_shuffle_rank(df, "doc_id", buckets=1 << 17)


def test_plan_hash_exchange_never_range(spark) -> None:
    plan = (
        global_shuffle_rank(_df(spark, 2000), "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" not in plan.lower(), plan
    assert "hashpartitioning(_bkt" in plan.lower(), plan
