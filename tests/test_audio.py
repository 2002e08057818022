"""Audio spectral features + Haitsma-Kalker fingerprint (operators/audio.py).

The STFT is cross-checked against an independent O(n^2) direct DFT (explicit
cos/sin sums — no shared FFT code path), sines land their energy in the
right band with the centroid at the tone frequency, and the fingerprint
shows the published behavior: identical audio → 0 bit errors, mildly noisy
copy → low bit-error rate, unrelated audio → ~50%.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from signalk_parquet_spark.operators.audio import (
    _stft_power,
    audio_fingerprint,
    audio_spectral_features,
    decode_wav_samples,
    fingerprint_hamming,
)


def wav_bytes(x: np.ndarray, rate: int = 8000, nch: int = 1) -> bytes:
    """float [-1,1] (n,) or (n, nch) -> 16-bit PCM WAV bytes."""
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def sine(freq: float, rate: int = 8000, n: int = 8000, amp: float = 0.5) -> np.ndarray:
    return amp * np.sin(2.0 * np.pi * freq * np.arange(n) / rate)


def test_decode_wav_samples_mono_and_stereo():
    x = sine(440.0)
    rate, nch, got = decode_wav_samples(wav_bytes(x))
    assert (rate, nch) == (8000, 1)
    np.testing.assert_allclose(got, x, atol=1.0 / 32767)
    stereo = np.stack([x, -x], axis=1)  # L/R cancel -> mono ~ 0
    rate, nch, got = decode_wav_samples(wav_bytes(stereo, nch=2))
    assert nch == 2 and np.abs(got).max() <= 1.0 / 32767
    assert decode_wav_samples(b"RIFFxxxxNOPE") is None


def test_stft_power_matches_direct_dft():
    """Independent check: one Hann-windowed frame's power spectrum equals an
    explicit sum_x w[x] f[x] e^{-2pi i kx/N} computed with cos/sin loops."""
    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, size=64)
    p = _stft_power(x, n_fft=64, hop=64)
    assert p.shape == (1, 33)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(64) / 64)
    f = x * win
    for k in range(33):
        re = sum(f[t] * np.cos(-2.0 * np.pi * k * t / 64) for t in range(64))
        im = sum(f[t] * np.sin(-2.0 * np.pi * k * t / 64) for t in range(64))
        assert p[0, k] == pytest.approx(re * re + im * im, rel=1e-9, abs=1e-9)


def test_spectral_features_sine_centroid_and_band():
    """A 1 kHz tone at 8 kHz sampling: centroid ~ 1 kHz and the tone's band
    (band 2 of 8 over 0-4 kHz = 1.0-1.5 kHz) dominates."""
    feats = audio_spectral_features(wav_bytes(sine(1100.0)))
    centroid, zcr = feats[0], feats[1]
    bands = feats[2:]
    assert centroid == pytest.approx(1100.0, abs=60.0)
    assert zcr == pytest.approx(2 * 1100.0 / 8000.0, abs=0.01)
    assert int(np.argmax(bands)) == 2  # 1100 Hz -> [1000, 1500) band
    assert all(np.isnan(f) for f in audio_spectral_features(b"not audio"))
    silent = audio_spectral_features(wav_bytes(np.zeros(4000)))
    assert silent[0] == 0.0 and silent[1] == 0.0


def test_fingerprint_robustness_ladder():
    """Identical → BER 0; +1% noise → BER well under the 0.35 match
    threshold; unrelated noise → BER ~ 0.5."""
    rng = np.random.RandomState(9)
    a = (sine(500.0) + sine(1300.0, amp=0.3) + 0.05 * rng.standard_normal(8000)) * 0.5
    fp_a = audio_fingerprint(wav_bytes(a))
    from signalk_parquet_spark.operators.audio import fingerprint_bits

    bits = fingerprint_bits()
    assert 20 <= bits <= 32  # edge rounding collapses below the paper's 32
    assert fp_a is not None and len(fp_a) > 50
    assert all(0 <= v < (1 << bits) for v in fp_a)
    assert fingerprint_hamming(fp_a, audio_fingerprint(wav_bytes(a))) == 0.0

    noisy = a + 0.01 * rng.standard_normal(a.size)
    ber_noisy = fingerprint_hamming(fp_a, audio_fingerprint(wav_bytes(noisy))) / bits
    other = 0.5 * rng.standard_normal(8000).clip(-1, 1)
    ber_other = fingerprint_hamming(fp_a, audio_fingerprint(wav_bytes(other))) / bits
    assert ber_noisy < 0.2 < 0.35 < ber_other < 0.65

    assert audio_fingerprint(b"junk") is None
    assert audio_fingerprint(wav_bytes(np.zeros(64))) == []


def test_decode_features_audio_spectral_registered(spark):
    """The spectral extractor rides the standard DECODERS registry through
    the Arrow-batched decode_features map stage."""
    from signalk_parquet_spark.operators.multimodal import MEDIA_SCHEMA, decode_features

    payload = wav_bytes(sine(1100.0))
    rows = [(1, "audio_spectral", "audio/wav", payload, None, None, 1.0, "{}")]
    feats = decode_features(
        spark.createDataFrame(rows, MEDIA_SCHEMA)
    ).collect()[0]["features"]
    assert len(feats) == 10
    assert feats[0] == pytest.approx(1100.0, abs=60.0)


def test_audio_neardup_pairs(spark):
    """Bucketed fingerprint join finds the noisy copy (BER well under the
    threshold), not the unrelated clip; the max_df stop-bucket cap can
    suppress candidate generation entirely."""
    from signalk_parquet_spark.operators.audio import audio_neardup_pairs

    rng = np.random.RandomState(17)
    base = (sine(500.0) + sine(1300.0, amp=0.3) + 0.05 * rng.standard_normal(8000)) * 0.5
    noisy = base + 0.01 * rng.standard_normal(base.size)
    other = 0.5 * rng.standard_normal(8000).clip(-1, 1)
    df = spark.createDataFrame(
        [
            (1, bytearray(wav_bytes(base))),
            (2, bytearray(wav_bytes(noisy))),
            (3, bytearray(wav_bytes(other))),
            (4, bytearray(b"not audio")),
        ],
        "media_id long, payload binary",
    )
    pairs = audio_neardup_pairs(df).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["ber"] < 0.2 and pairs[0]["hits"] >= 1
    # a BER computed JVM-side must agree with the driver-side helper
    from signalk_parquet_spark.operators.audio import (
        audio_fingerprint,
        fingerprint_bits,
        fingerprint_hamming,
    )

    want = fingerprint_hamming(
        audio_fingerprint(wav_bytes(base)), audio_fingerprint(wav_bytes(noisy))
    ) / fingerprint_bits()
    assert pairs[0]["ber"] == pytest.approx(want, abs=1e-12)
    assert audio_neardup_pairs(df, max_df=0).count() == 0


def test_streaming_audio_neardup_matches_batch(spark, tmp_path):
    """The audio rung of the streaming dedup ladder: a batch-2 noisy copy
    of a batch-1 clip emits a match event pointing across the batch line,
    an unrelated clip and an undecodable payload emit nothing — and the
    distinct (media_id, dup_of) match set EQUALS the batch operator's
    pair set on the same corpus (every_pos=1 makes the candidate/verify
    conditions identical; fingerprints are the same arithmetic)."""
    from signalk_parquet_spark.operators.audio import audio_neardup_pairs
    from signalk_parquet_spark.streaming.stateful import streaming_audio_neardup

    rng = np.random.RandomState(31)
    base = (sine(500.0) + sine(1300.0, amp=0.3) + 0.05 * rng.standard_normal(8000)) * 0.5
    noisy = base + 0.01 * rng.standard_normal(base.size)
    other = 0.5 * rng.standard_normal(8000).clip(-1, 1)
    batches = [
        [(1, bytearray(wav_bytes(base))), (4, bytearray(b"not audio"))],
        [(2, bytearray(wav_bytes(noisy))), (3, bytearray(wav_bytes(other)))],
    ]
    schema = "media_id long, payload binary"
    src = str(tmp_path / "audio_src")
    spark.createDataFrame(batches[0], schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(batches[1], schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    q = (
        streaming_audio_neardup(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("audio_nd_out")
        .option("checkpointLocation", str(tmp_path / "audio_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    events = spark.sql("SELECT * FROM audio_nd_out").collect()
    got = {(r["media_id"], r["dup_of"]) for r in events}
    assert all(r["ber"] <= 0.35 for r in events)

    batch_df = spark.createDataFrame([d for b in batches for d in b], schema)
    want = {
        (r["id_b"], r["id_a"])
        for r in audio_neardup_pairs(batch_df, max_df=None).collect()
    }
    assert got == want == {(2, 1)}


def test_empty_pcm_wav_scores_as_silence():
    """A valid WAV header with zero PCM frames must score at the log-power
    FLOOR (silence), not 0.0 — which on a log scale reads as loud and
    sails through loudness screens (regression)."""
    feats = audio_spectral_features(wav_bytes(np.zeros(0)))
    assert feats[:2] == [0.0, 0.0]
    assert all(b == -12.0 for b in feats[2:])
    loud = audio_spectral_features(wav_bytes(sine(700.0)))
    assert max(loud[2:]) > max(feats[2:])
