"""Stateful streaming (threshold hysteresis + EMA across micro-batches) and
schema diagnosis/repair."""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from tests.records import T0, records_df, scalar_series


def _run_stream(spark, tmp_path, batches, make_query):
    """Drive a stateful stream file-source with multiple micro-batches:
    write batch files one at a time with maxFilesPerTrigger=1 so state
    must carry across batches."""
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        records_df(spark, rows).coalesce(1).write.mode(
            "append" if i else "overwrite"
        ).parquet(src)
    schema = records_df(spark, batches[0]).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = make_query(stream)
    q.processAllAvailable()
    q.stop()


def test_streaming_threshold_hysteresis_across_batches(spark, tmp_path):
    from signalk_parquet_spark.streaming.stateful import streaming_threshold_transitions

    # batch 1 ends ABOVE threshold; batch 2 starts above (no event) then drops
    b1 = scalar_series(T0, [1.0, 9.0])
    b2 = scalar_series(T0 + timedelta(seconds=10), [8.0, 2.0])
    out_name = "thresh_out"

    def mk(stream):
        t = streaming_threshold_transitions(stream, threshold=5.0)
        return (
            t.writeStream.outputMode("append").format("memory").queryName(out_name).start()
        )

    _run_stream(spark, tmp_path, [b1, b2], mk)
    rows = spark.sql(f"SELECT * FROM {out_name} ORDER BY ts").collect()
    events = [r["event"] for r in rows]
    # 1->9 activates; 8 (still above, across the batch boundary) suppressed; 2 deactivates
    assert events == ["activated", "deactivated"]
    assert [r["value"] for r in rows] == [9.0, 2.0]


def test_streaming_threshold_first_observation_fires(spark, tmp_path):
    """A stream that STARTS over-threshold must emit 'activated' on its
    first observation: the reference's command state defaults OFF
    (commands.ts Boolean(undefined)), so the first true evaluation fires —
    and the batch twin coalesces the lag state to False. The old streaming
    behavior ('first observation sets state, no event') silently swallowed
    that activation; this pins streaming == batch on exactly that shape,
    across a micro-batch split."""
    from signalk_parquet_spark.operators.thresholds import (
        threshold_predicate,
        threshold_transitions,
    )
    from signalk_parquet_spark.streaming.stateful import (
        streaming_threshold_transitions,
    )

    # first value already above threshold; then a drop, a re-activation
    # in the second micro-batch, and a below-threshold tail
    b1 = scalar_series(T0, [9.0, 7.5, 2.0])
    b2 = scalar_series(T0 + timedelta(seconds=30), [8.0, 1.0])
    out_name = "thresh_first_out"

    def mk(stream):
        t = streaming_threshold_transitions(stream, threshold=5.0)
        return (
            t.writeStream.outputMode("append")
            .format("memory")
            .queryName(out_name)
            .start()
        )

    _run_stream(spark, tmp_path, [b1, b2], mk)
    got = [
        (r["ts"], r["value"], r["event"])
        for r in spark.sql(f"SELECT * FROM {out_name} ORDER BY ts").collect()
    ]

    batch_df = records_df(spark, b1 + b2)
    cond = threshold_predicate("gt", F.col("value"), {"value": 5.0})
    want = [
        (r["signalk_timestamp"], r["value"], r["event"])
        for r in threshold_transitions(batch_df, "signalk_timestamp", cond)
        .orderBy("signalk_timestamp")
        .collect()
    ]
    assert got == want
    assert [e for _, _, e in got] == [
        "activated", "deactivated", "activated", "deactivated"
    ]
    assert got[0][1] == 9.0  # the first observation itself fired


def test_streaming_ema_state_continues_across_batches(spark, tmp_path):
    from signalk_parquet_spark.streaming.stateful import streaming_ema

    b1 = scalar_series(T0, [4.0, 5.0])
    b2 = scalar_series(T0 + timedelta(seconds=10), [6.0])
    out_name = "ema_out"

    def mk(stream):
        return (
            streaming_ema(stream, alpha=0.2)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(out_name)
            .start()
        )

    _run_stream(spark, tmp_path, [b1, b2], mk)
    rows = spark.sql(f"SELECT ema FROM {out_name} ORDER BY ts").collect()
    # seed 4.0; 0.2*5+0.8*4=4.2; then ACROSS the batch boundary 0.2*6+0.8*4.2=4.56
    assert [r["ema"] for r in rows] == pytest.approx([4.0, 4.2, 4.56])


def test_schema_diagnose_and_repair(spark):
    from signalk_parquet_spark.operators.schema_repair import (
        diagnose,
        quarantine_unparseable,
        repair,
    )

    df = spark.createDataFrame(
        [("3.14", "true", 7, "ok"), ("2.71", "false", 8, "ok"), ("1.0", "true", 9, "ok")],
        "value_num string, value_flag string, value_count long, value_text string",
    )
    diag = diagnose(df)
    assert diag.string_numerics == ["value_num"]
    assert diag.string_booleans == ["value_flag"]
    assert diag.bigints == ["value_count"]
    fixed = repair(df, diag)
    types = dict((f.name, f.dataType.simpleString()) for f in fixed.schema.fields)
    assert types["value_num"] == "double"
    assert types["value_flag"] == "boolean"
    assert types["value_count"] == "double"  # BIGINT banned -> DOUBLE
    assert fixed.agg(F.sum("value_num")).first()[0] == pytest.approx(6.85)


def test_schema_quarantine_split(spark):
    from signalk_parquet_spark.operators.schema_repair import diagnose, quarantine_unparseable

    df = spark.createDataFrame(
        [("1.5",), ("2.5",), ("7.5",)], "value_num string"
    )
    diag = diagnose(df)
    # inject a corrupt batch AFTER diagnosis (the repair-time reality)
    dirty = df.union(spark.createDataFrame([("not-a-number",)], "value_num string"))
    clean, quarantined = quarantine_unparseable(dirty, diag)
    assert clean.count() == 3 and quarantined.count() == 1
    assert quarantined.first()["value_num"] == "not-a-number"


def test_streaming_neardup_state_survives_query_restart(spark, tmp_path):
    """Near-dup state must RECOVER FROM THE CHECKPOINT across two separate
    query runs (not micro-batches of one run): batch 2 arrives in a brand-new
    query and its near-copy must still match batch 1's doc — the property
    that makes continuous-ingest dedup restart-safe. Parquet sink: the
    memory sink cannot recover from checkpoints (CLAUDE.md)."""
    from signalk_parquet_spark.streaming.stateful import streaming_neardup_minhash

    a = "the quick brown fox jumps over the lazy dog again and again today"
    src = str(tmp_path / "nd_src")
    out = str(tmp_path / "nd_out")
    ckpt = str(tmp_path / "nd_ckpt")
    schema = "doc_id long, text string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_neardup_minhash(stream, k=8, bands=4, agree=0.5)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1, a)], schema).coalesce(1).write.parquet(src)
    run_once()  # first run: doc 1 becomes bucket state, no matches
    spark.createDataFrame(
        [(3, a.replace("today", "tonight"))], schema
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()  # NEW query, same checkpoint: state must come back

    got = {(r["doc_id"], r["dup_of"]) for r in spark.read.parquet(out).collect()}
    assert got == {(3, 1)}, got


def test_streaming_neardup_rocksdb_state_provider(spark, tmp_path):
    """The same restart-recovery property on the RocksDB state store —
    the provider every at-scale deployment runs (bounded executor memory,
    changelog checkpointing): state written by run 1 under RocksDB must
    come back in a brand-new run 2 and still match the near-copy."""
    from signalk_parquet_spark.streaming.stateful import streaming_neardup_minhash

    a = "the quick brown fox jumps over the lazy dog again and again today"
    src = str(tmp_path / "rdb_src")
    out = str(tmp_path / "rdb_out")
    ckpt = str(tmp_path / "rdb_ckpt")
    schema = "doc_id long, text string"
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        def run_once():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (
                streaming_neardup_minhash(stream, k=8, bands=4, agree=0.5)
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)

        spark.createDataFrame([(1, a)], schema).coalesce(1).write.parquet(src)
        run_once()
        spark.createDataFrame(
            [(3, a.replace("today", "tonight"))], schema
        ).coalesce(1).write.mode("append").parquet(src)
        run_once()
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    got = {(r["doc_id"], r["dup_of"]) for r in spark.read.parquet(out).collect()}
    assert got == {(3, 1)}, got
