"""Measured scale ramp for the media operators (SCALE.md source).

- frame_sample_features: N MJPEG-AVI payloads (one encoder-built clip,
  replicated with distinct ids — per-payload decode work is identical),
  wall vs N. Expect ~linear: one Arrow map stage, no shuffle.
- audio_neardup_pairs: N executor-generated WAV clips (seeded sine-mix
  synthesis inside mapInPandas — no driver materialization), every 10th
  clip a noisy copy of an earlier one. Wall + found pairs vs N.

Run: python tools/media_ramp.py
"""

from __future__ import annotations

import io
import sys
import time
import wave

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from signalk_parquet_spark.session import get_spark  # noqa: E402


def _wav_bytes(x: np.ndarray, rate: int = 8000) -> bytes:
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def _clip(seed: int, n: int = 8000) -> bytes:
    """Deterministic clip: seeds ending in 9 are noisy copies of seed-9."""
    base_seed = seed - 9 if seed % 10 == 9 else seed
    rng = np.random.RandomState(base_seed)
    f1, f2 = rng.uniform(200, 1800, 2)
    x = 0.4 * np.sin(2 * np.pi * f1 * np.arange(n) / 8000)
    x += 0.25 * np.sin(2 * np.pi * f2 * np.arange(n) / 8000)
    x += 0.05 * rng.standard_normal(n)
    if seed % 10 == 9:
        x = x + 0.01 * np.random.RandomState(seed).standard_normal(n)
    return _wav_bytes(x * 0.8)


def audio_ramp(spark, sizes=(250, 1000, 4000)):
    from signalk_parquet_spark.operators.audio import audio_neardup_pairs

    print("audio_neardup_pairs ramp (executor-generated clips)")
    for n in sizes:
        def gen(it):
            import pandas as pd

            for pdf in it:
                ids = pdf["id"].tolist()
                yield pd.DataFrame(
                    {"media_id": ids, "payload": [_clip(int(i)) for i in ids]}
                )

        clips = (
            spark.range(n).repartition(32)
            .mapInPandas(gen, "media_id long, payload binary")
        )
        t = time.time()
        pairs = audio_neardup_pairs(clips).count()
        print(f"  n={n}: {time.time() - t:.1f} s, {pairs} pairs")


def frames_ramp(spark, sizes=(200, 1000, 4000)):
    from tests.test_jpeg import _QLUMA, _test_image, encode_jpeg
    from tests.test_video import make_avi

    from signalk_parquet_spark.operators.multimodal import frame_sample_features

    frames = []
    for k in range(4):
        img = _test_image(64, 64, seed=k)
        payload, _ = encode_jpeg([img], 64, 64, [(1, 1)], [_QLUMA])
        frames.append(payload)
    avi = make_avi(frames, 64, 64)
    print(f"frame_sample_features ramp (4-frame 64x64 MJPEG AVI, {len(avi)} B)")
    for n in sizes:
        df = spark.range(n).repartition(32).select(
            F.col("id").alias("media_id"), F.lit(bytearray(avi)).alias("payload")
        )
        t = time.time()
        rows = frame_sample_features(df, thumb=(8, 8)).count()
        print(f"  n={n}: {time.time() - t:.1f} s, {rows} frame rows")


def mjpeg_features_ramp(spark, sizes=(2_000, 8_000, 32_000)):
    """The r9 gate's pipeline uncapped: executor-generated planted MJPEG-AVI
    corpus (mediagen.mjpeg_payload_for — DC-only exact-round-trip JPEG) ->
    container walk -> per-frame entropy decode -> integer luma stats; the
    plant gives every run an EXACTNESS check, not just a wall clock."""
    from signalk_parquet_spark.operators.video import video_frame_luma_stats

    print("mjpeg_frame_features ramp (executor-generated 4-frame 32x24 MJPEG)")
    for n in sizes:
        def gen(it):
            import pandas as pd

            from signalk_parquet_spark.functions.mediagen import mjpeg_payload_for

            for pdf in it:
                ids = [int(x) for x in pdf["id"].tolist()]
                yield pd.DataFrame(
                    {"doc_id": ids, "payload": [mjpeg_payload_for(i) for i in ids]}
                )

        df = spark.range(n).repartition(32).mapInPandas(
            gen, "doc_id long, payload binary"
        )
        t = time.time()
        stats = video_frame_luma_stats(
            df, id_col="doc_id", payload_col="payload", max_frames=8
        )
        # exactness alongside the wall: luma_sum must equal the analytic
        # plant (mediagen.mjpeg_block_value as a native expression — 12
        # blocks, so the interpreted HOF re-eval cost is nil)
        expected = F.expr(
            "64 * aggregate(sequence(0, 11), 0L, (acc, b) -> "
            "acc + (CAST(id / 4 AS LONG) * 73 + frame_idx * 31 + b * 17) % 251 + 2)"
        )
        bad = stats.filter(F.col("luma_sum") != expected).count()
        rows = stats.count()
        wall = time.time() - t
        ok = "exact" if bad == 0 else f"{bad} MISMATCHES"
        print(f"  n={n}: {wall:.1f} s ({n / wall:.0f} clips/s), {rows} frame rows [{ok}]")



def image_video_ramp(spark, sizes=(200, 1000, 4000)):
    """Image + video near-dup rungs: every 10th payload is a JPEG
    re-encode of an earlier one (the near-dup mass), payload synthesis
    executor-side from the seed id."""
    from signalk_parquet_spark.operators.multimodal import image_neardup_pairs
    from signalk_parquet_spark.operators.video import video_neardup_pairs

    def block_img(seed, h=16, w=16):
        # distinct PHOTO-LIKE content: a random low-frequency cosine field.
        # Two failure modes this dodges, both measured: a shared ramp +
        # noise makes EVERY image a near-dup of every other (dHash
        # correctly collapses them — 680k pairs at n=4000), and flat
        # blocks make every luma comparison a TIE that requantization
        # flips (re-encode Hamming 8-21 — dHash's documented weakness on
        # synthetic flat content). Smooth fields measure re-encode Hamming
        # 0-6 vs unrelated 19-46.
        rng = np.random.RandomState(seed)
        y, x = np.mgrid[0:h, 0:w]
        img = np.zeros((h, w))
        for _ in range(3):
            fy, fx = rng.uniform(0.3, 1.5, 2)
            py, px_ = rng.uniform(0, 2 * np.pi, 2)
            img += rng.uniform(0.5, 1.0) * np.cos(
                2 * np.pi * fy * y / h + py
            ) * np.cos(2 * np.pi * fx * x / w + px_)
        img -= img.min()
        img *= 255.0 / max(img.max(), 1e-9)
        return img

    def gen_images(it):
        import pandas as pd

        from tests.test_jpeg import encode_jpeg

        for pdf in it:
            rows = []
            for i in pdf["id"].tolist():
                base = i - 9 if i % 10 == 9 else i
                q = 20 if i % 10 == 9 else 16
                img = block_img(int(base))
                rows.append((int(i), encode_jpeg([img], 16, 16, [(1, 1)], [[q] * 64])[0]))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    def gen_clips(it):
        import pandas as pd

        from tests.test_jpeg import encode_jpeg
        from tests.test_video import make_avi

        for pdf in it:
            rows = []
            for i in pdf["id"].tolist():
                base = i - 9 if i % 10 == 9 else i
                q = 20 if i % 10 == 9 else 16
                frames = [
                    encode_jpeg([block_img(int(base) * 4 + k)],
                                16, 16, [(1, 1)], [[q] * 64])[0]
                    for k in range(4)
                ]
                rows.append((int(i), make_avi(frames, 16, 16)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    print("image_neardup_pairs ramp")
    for n in sizes:
        df = spark.range(n).repartition(32).mapInPandas(
            gen_images, "media_id long, payload binary"
        )
        t = time.time()
        pairs = image_neardup_pairs(df).count()
        print(f"  n={n}: {time.time() - t:.1f} s, {pairs} pairs")
    print("video_neardup_pairs ramp")
    for n in sizes:
        df = spark.range(n).repartition(32).mapInPandas(
            gen_clips, "media_id long, payload binary"
        )
        t = time.time()
        pairs = video_neardup_pairs(df).count()
        print(f"  n={n}: {time.time() - t:.1f} s, {pairs} pairs")


def streaming_ramp(spark, n_batches: int = 10, per_batch: int = 60):
    """Reproduces the SCALE.md streaming-rung throughput numbers: N
    micro-batches of clips/images through each streaming near-dup rung
    (memory sink, availableNow), reporting end-to-end rate and how many
    of the planted 10% dups were flagged."""
    import os
    import tempfile

    from signalk_parquet_spark.streaming.stateful import (
        streaming_audio_neardup,
        streaming_image_neardup,
        streaming_video_neardup,
    )
    from tests.test_jpeg import encode_jpeg
    from tests.test_video import make_avi

    def smooth(seed, h=16, w=16):
        rng = np.random.RandomState(seed)
        y, x = np.mgrid[0:h, 0:w]
        img = np.zeros((h, w))
        for _ in range(3):
            fy, fx = rng.uniform(0.3, 1.5, 2)
            py, px_ = rng.uniform(0, 2 * np.pi, 2)
            img += rng.uniform(0.5, 1.0) * np.cos(
                2 * np.pi * fy * y / h + py
            ) * np.cos(2 * np.pi * fx * x / w + px_)
        img -= img.min()
        img *= 255.0 / max(img.max(), 1e-9)
        return img

    def jpg(seed, q):
        return encode_jpeg([smooth(seed)], 16, 16, [(1, 1)], [[q] * 64])[0]

    def dup_params(i):
        return (i - 9 if i % 10 == 9 else i), (20 if i % 10 == 9 else 16)

    rungs = (
        ("audio", streaming_audio_neardup, lambda i: _clip(i)),
        ("image", streaming_image_neardup,
         lambda i: jpg(*dup_params(i))),
        ("video", streaming_video_neardup,
         lambda i: make_avi(
             [jpg(dup_params(i)[0] * 4 + k, dup_params(i)[1]) for k in range(4)],
             16, 16)),
    )
    for name, op, payload_fn in rungs:
        d = tempfile.mkdtemp()
        src = os.path.join(d, "src")
        for b in range(n_batches):
            rows = [(b * per_batch + i, bytearray(payload_fn(b * per_batch + i)))
                    for i in range(per_batch)]
            spark.createDataFrame(rows, "media_id long, payload binary") \
                .coalesce(1).write.mode("append").parquet(src)
        stream = spark.readStream.schema("media_id long, payload binary") \
            .option("maxFilesPerTrigger", "1").parquet(src)
        t0 = time.time()
        q = (op(stream).writeStream.outputMode("append").format("memory")
             .queryName(f"ramp_{name}")
             .option("checkpointLocation", os.path.join(d, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(600)
        wall = time.time() - t0
        total = n_batches * per_batch
        dups = spark.sql(
            f"SELECT count(DISTINCT media_id) c FROM ramp_{name}"
        ).collect()[0]["c"]
        print(f"  {name}: {total} payloads / {wall:.1f}s = {total / wall:.0f}/s, "
              f"dups flagged {dups}/{total // 10}")

def decisions_ramp(spark, sizes=(2_000, 8_000, 32_000)):
    """END-TO-END keep/drop decisions (the image_dedup_decisions pipeline,
    UNCAPPED): planted mediagen corpus of N items -> decode(BMP+PNG) ->
    dHash -> band join -> CC -> keep-min-id. Verifies the gate's _CAP is
    purely an evaluation bound: the pipeline itself must stay ~linear and
    keep recovering exactly N/4 planted groups as N ramps past the cap."""
    from pyspark.sql import types as T

    from signalk_parquet_spark.operators.dedup import pairs_to_decisions
    from signalk_parquet_spark.operators.multimodal import image_neardup_pairs

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )

    def gen(it):
        import pandas as pd

        from signalk_parquet_spark.functions.mediagen import payload_for

        for pdf in it:
            ids = [int(x) for x in pdf["id"].tolist()]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [payload_for(i) for i in ids]}
            )

    print("image decisions ramp (decode->hash->band->CC->keep, uncapped):")
    for n in sizes:
        docs = spark.range(n).repartition(32)
        imgs = docs.mapInPandas(gen, schema=schema)
        t0 = time.perf_counter()
        pairs = image_neardup_pairs(
            imgs, id_col="doc_id", payload_col="payload", max_hamming=3, bands=4
        )
        dec = pairs_to_decisions(
            docs.select(F.col("id").alias("doc_id")), pairs, id_col="doc_id"
        )
        kept = dec.filter("kept").count()
        wall = time.perf_counter() - t0
        ok = "exact" if kept == (n + 3) // 4 else f"EXPECTED {(n + 3) // 4}"
        print(f"  N={n}: {wall:.1f}s ({n / wall:.0f} items/s), kept {kept} [{ok}]")


if __name__ == "__main__":
    spark = get_spark("media_ramp")
    spark.range(32).mapInPandas(lambda it: it, "id long").count()  # warm Arrow
    frames_ramp(spark)
    mjpeg_features_ramp(spark)
    audio_ramp(spark)
    image_video_ramp(spark)
    decisions_ramp(spark)
    print("streaming rung throughput:")
    streaming_ramp(spark)
