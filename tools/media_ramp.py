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


if __name__ == "__main__":
    spark = get_spark("media_ramp")
    spark.range(32).mapInPandas(lambda it: it, "id long").count()  # warm Arrow
    frames_ramp(spark)
    audio_ramp(spark)
