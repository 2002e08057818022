"""Weighted sampling without replacement (operators/sampling.weighted_sample,
Efraimidis–Spirakis A-ES): exact differential vs an independent pure-Python
implementation of the same spec, inclusion-probability statistics across
independent salts, partitioning-invariance, the w>0 domain rule, and the
TakeOrderedAndProject plan shape (the no-global-sort claim)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from signalk_parquet_spark.operators.sampling import weighted_sample

_U_DEN = float((1 << 48) + 1)


def _py_sample(rows: list[tuple[int, int]], k: int, salt: str = "aes") -> list[int]:
    """Independent reference: same spec, hashlib + math.log."""
    keyed = []
    for i, w in rows:
        if w is None or w <= 0:
            continue
        u = (int(hashlib.md5(f"{i}{salt}".encode()).hexdigest()[:12], 16) + 1) / _U_DEN
        keyed.append((math.log(u) / w, -i))
    keyed.sort(reverse=True)
    return [-neg_i for _, neg_i in keyed[:k]]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, wt long")


def test_matches_python_reference_exactly(spark) -> None:
    rows = [(i, (i * 13) % 29 + 1) for i in range(400)]
    got = [r["doc_id"] for r in weighted_sample(_df(spark, rows), "doc_id", "wt", 50).collect()]
    assert got == _py_sample(rows, 50)


def test_partitioning_invariant_and_salt_varies(spark) -> None:
    rows = [(i, i % 7 + 1) for i in range(300)]
    df1 = _df(spark, rows).repartition(1)
    df32 = _df(spark, rows).repartition(32)
    s1 = [r["doc_id"] for r in weighted_sample(df1, "doc_id", "wt", 40).collect()]
    s32 = [r["doc_id"] for r in weighted_sample(df32, "doc_id", "wt", 40).collect()]
    assert s1 == s32  # content-hash keys: layout-independent
    other = [r["doc_id"] for r in weighted_sample(df1, "doc_id", "wt", 40, salt="b").collect()]
    assert set(other) != set(s1)  # a different salt is an independent draw


def test_inclusion_tracks_weight(spark) -> None:
    """Statistical invariant of A-ES: across independent salts, a
    weight-10 item is included far more often than a weight-1 item.
    Deterministic (fixed salt list) — not flaky."""
    rows = [(i, 10 if i < 20 else 1) for i in range(40)]
    heavy = light = 0
    for s in range(30):
        got = _py_sample(rows, 10, salt=f"s{s}")
        heavy += sum(1 for i in got if i < 20)
        light += sum(1 for i in got if i >= 20)
    # expected heavy share with w=10 vs w=1 is >> 50%; require 3x
    assert heavy > 3 * light, (heavy, light)


def test_nonpositive_and_null_weights_excluded(spark) -> None:
    rows = [(1, 5), (2, 0), (3, -4), (4, None), (5, 2)]
    df = spark.createDataFrame(rows, "doc_id long, wt long")
    got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "wt", 10).collect()}
    assert got == {1, 5}
    with pytest.raises(ValueError, match="k must be >= 1"):
        weighted_sample(df, "doc_id", "wt", 0)


def test_plan_is_take_ordered_not_global_sort(spark) -> None:
    df = _df(spark, [(i, i + 1) for i in range(100)]).repartition(8)
    plan = (
        weighted_sample(df, "doc_id", "wt", 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_streaming_twin_matches_batch(spark, tmp_path) -> None:
    """Replay the corpus as two micro-batches: the union of the groups'
    latest top-k snapshots must contain the batch sample (the superset
    contract), and the exact merge of those snapshots (key DESC, id ASC,
    take k) must equal the batch operator's output — both rank on the
    same JVM key expression, so agreement is bit-for-bit."""
    from signalk_parquet_spark.streaming.stateful import streaming_weighted_sample

    rows = [(i, (i * 13) % 29 + 1) for i in range(400)]
    schema = "doc_id long, wt long"
    src = str(tmp_path / "ws_src")
    spark.createDataFrame(rows[:200], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows[200:], schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        streaming_weighted_sample(stream, "doc_id", "wt", k=25, n_groups=4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ws_out")
        .option("checkpointLocation", str(tmp_path / "ws_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("select * from ws_out").toPandas()
    assert len(emitted), "stream emitted nothing"
    latest = emitted[
        emitted.groupby("grp")["n_seen"].transform("max") == emitted["n_seen"]
    ]
    assert latest.groupby("grp").size().max() <= 25
    merged = latest.sort_values(["skey", "id"], ascending=[False, True]).head(25)
    batch = [
        (r["doc_id"], r["wt"])
        for r in weighted_sample(_df(spark, rows), "doc_id", "wt", 25).collect()
    ]
    assert list(zip(merged["id"].tolist(), merged["wt"].tolist())) == batch


def test_streaming_twin_rejects_non_integral_id(spark) -> None:
    """The state schema holds BIGINT ids; a string id would cast to NULL
    and silently collapse the sample into seen={None} — the plan-time
    guard refuses the column type before any data flows."""
    from signalk_parquet_spark.streaming.stateful import streaming_weighted_sample

    stream = (
        spark.readStream.format("rate").load()
        .select(F.col("value").cast("string").alias("doc_id"),
                (F.col("value") % 5 + 1).alias("wt"))
    )
    with pytest.raises(ValueError, match="BIGINT ids"):
        streaming_weighted_sample(stream, "doc_id", "wt", k=5)


def test_streaming_twin_null_id_fails_loudly(spark, tmp_path) -> None:
    """A NULL id inside otherwise-integral data must raise, not be
    deduplicated into the sample as None (mirrors write_shards' guard)."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import StreamingQueryException

    from signalk_parquet_spark.streaming.stateful import streaming_weighted_sample

    schema = "doc_id long, wt long"
    src = str(tmp_path / "wsnull_src")
    spark.createDataFrame([(1, 3), (None, 4), (2, 5)], schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_weighted_sample(stream, "doc_id", "wt", k=5, n_groups=2)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wsnull_out")
        .option("checkpointLocation", str(tmp_path / "wsnull_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises((StreamingQueryException, Py4JJavaError), match="NULL doc_id"):
        q.awaitTermination(120)
