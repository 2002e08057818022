"""Property-based tests (hypothesis) for the r5 pure-Python surfaces:
mediagen encoders round-trip through the repo's own decoders for ARBITRARY
pixel/sample content (not just the planted corpora), and the replay pacer
preserves schedule order and pacing for arbitrary schedules."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from signalk_parquet_spark.functions.mediagen import (
    encode_bmp_gray_as_rgb24,
    encode_gif_frames,
    encode_png_gray,
    encode_wav_pcm16,
)
from signalk_parquet_spark.operators.audio import decode_wav_samples
from signalk_parquet_spark.operators.multimodal import decode_image_pixels, image_dhash
from signalk_parquet_spark.operators.raster import decode_gif_frames
from signalk_parquet_spark.streaming.replay import replay


def _gray(draw_bytes: bytes, h: int, w: int):
    arr = np.frombuffer((draw_bytes * (h * w // len(draw_bytes) + 1))[: h * w], dtype=np.uint8)
    return arr.reshape(h, w).copy()


dims = st.tuples(st.integers(1, 24), st.integers(1, 24))
content = st.binary(min_size=1, max_size=64)


@settings(max_examples=40, deadline=None)
@given(dims, content)
def test_png_bmp_roundtrip_and_hash_parity_arbitrary_pixels(hw, raw):
    h, w = hw
    px = _gray(raw, h, w)
    d_png = decode_image_pixels(encode_png_gray(px))
    d_bmp = decode_image_pixels(encode_bmp_gray_as_rgb24(px))
    assert np.array_equal(d_png[:, :, 0], px)
    assert np.array_equal(d_bmp[:, :, 0], px)
    assert image_dhash(encode_png_gray(px)) == image_dhash(encode_bmp_gray_as_rgb24(px))


@settings(max_examples=30, deadline=None)
@given(dims, content, st.integers(1, 4))
def test_gif_multiframe_roundtrip_arbitrary_indices(hw, raw, n_frames):
    h, w = hw
    frames = [
        _gray(raw[i:] + raw[:i] if raw else b"\x00", h, w) for i in range(n_frames)
    ]
    gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    decoded = decode_gif_frames(encode_gif_frames(frames, gray))
    assert len(decoded) == n_frames
    for fr, idx in zip(decoded, frames):
        for c in range(3):
            assert np.array_equal(fr[:, :, c], idx)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(-8192, 8191), min_size=1, max_size=400),
    st.sampled_from([1, 2]),
)
def test_wav_roundtrip_arbitrary_samples(samples, channels):
    x = np.array(samples, dtype=np.int16)
    dec = decode_wav_samples(encode_wav_pcm16(x, channels=channels))
    assert dec is not None
    rate, nch, mono = dec
    assert nch == channels and rate == 8000
    # mono decode (or the L=R stereo mean) reproduces the samples exactly
    assert np.array_equal(mono, x.astype(np.float64) / 32768.0)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.floats(0, 1e6, allow_nan=False), st.floats(-1e3, 1e3, allow_nan=False)), min_size=1, max_size=60), st.integers(1, 7))
def test_replay_pacer_properties(points, batch_points):
    # build a schedule the way emission_schedule would: ts-ordered, seq'd
    points = sorted(points)
    rows = [
        {"batch_idx": i // batch_points, "seq": i, "ts": ts, "path": "p", "value": v}
        for i, (ts, v) in enumerate(points)
    ]
    waits, out = [], []
    n = replay(rows, out.append, tick_s=0.5, sleep=waits.append)
    assert n == len(points)
    # every point emitted, in seq order, values preserved
    assert [d["updates"][0]["values"][0]["value"] for d in out] == [v for _, v in points]
    # exactly one tick between consecutive batches, none inside a batch
    n_batches = (len(points) + batch_points - 1) // batch_points
    assert waits == [0.5] * (n_batches - 1)
