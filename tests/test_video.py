"""AVI container walker + MJPEG frame decode (operators/video.py).

The test file carries its own minimal AVI MUXER (RIFF chunks, hdrl
avih/strl headers, movi frame chunks, word alignment, 'rec ' interleave
groups) so the parser is exercised on independently-built containers, and
frames are JPEGs from the test-side encoder in tests/test_jpeg.py — so
frame decode asserts EXACT equality against the encoder's
decoder-arithmetic reconstruction, the same bar as the still-image tests.
"""

from __future__ import annotations

import struct

import numpy as np

from signalk_parquet_spark.operators.video import (
    decode_avi_frames,
    iter_video_chunks,
    parse_avi_header,
)

from tests.test_jpeg import _QLUMA, _test_image, encode_jpeg


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def make_avi(frames, w, h, fps=10, codec=b"MJPG", use_rec=False) -> bytes:
    """Mux frame payloads into a single-video-stream AVI."""
    avih = struct.pack(
        "<10I", int(1e6 / fps), 0, 0, 0, len(frames), 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = struct.pack(
        "<4s4sIHHIIIIIIII", b"vids", codec, 0, 0, 0, 0,
        1, fps, 0, len(frames), 0, 0, 0,
    ) + b"\x00" * 8  # rcFrame
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, codec, 0, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    payload_chunks = [_chunk(b"00dc", f) for f in frames]
    if use_rec:
        movi = _list(b"movi", b"".join(_list(b"rec ", c) for c in payload_chunks))
    else:
        movi = _list(b"movi", b"".join(payload_chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _jpeg_frames(n, h=16, w=16):
    """n encoder-built grayscale JPEG frames + exact expected pixel arrays."""
    frames, wants = [], []
    for k in range(n):
        img = _test_image(h, w, seed=100 + k)
        payload, exp = encode_jpeg([img], h, w, [(1, 1)], [_QLUMA])
        frames.append(payload)
        wants.append(exp[0][:h, :w][:, :, None])  # (H, W, 1) like the decoder
    return frames, wants


def test_parse_avi_header_fields():
    frames, _ = _jpeg_frames(3)
    avi = make_avi(frames, 16, 16, fps=25)
    meta = parse_avi_header(avi)
    assert meta == {
        "format": "avi", "width": 16, "height": 16, "fps": 25.0,
        "n_frames": 3, "codec": "MJPG", "n_streams": 1,
        "duration_s": 3 / 25, "video_stream": 0,
    }
    assert parse_avi_header(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert parse_avi_header(b"not a container") is None


def test_chunk_iteration_word_alignment_and_rec_groups():
    # odd-length payloads force pad bytes; 'rec ' groups must be descended
    frames = [b"\xff\xd8odd", b"\xff\xd8even", b"\xff\xd8x"]
    assert {len(f) & 1 for f in frames} == {0, 1}
    for use_rec in (False, True):
        avi = make_avi(frames, 4, 4, use_rec=use_rec)
        got = list(iter_video_chunks(avi, 0))
        assert got == frames


def test_decode_avi_frames_exact():
    frames, wants = _jpeg_frames(3)
    avi = make_avi(frames, 16, 16)
    out = decode_avi_frames(avi)
    assert out is not None
    total, decoded = out
    assert total == 3 and [i for i, _ in decoded] == [0, 1, 2]
    for (_, got), want in zip(decoded, wants):
        assert np.array_equal(got, want)


def test_decode_avi_frames_sampling_and_cap():
    frames, wants = _jpeg_frames(5)
    avi = make_avi(frames, 16, 16)
    total, decoded = decode_avi_frames(avi, every_n=2)
    assert total == 5 and [i for i, _ in decoded] == [0, 2, 4]
    assert np.array_equal(decoded[1][1], wants[2])
    total, decoded = decode_avi_frames(avi, max_frames=2)
    assert total == 5 and [i for i, _ in decoded] == [0, 1]


def test_decode_avi_rejects_non_mjpeg():
    frames, _ = _jpeg_frames(2)
    avi = make_avi(frames, 16, 16, codec=b"XVID")
    assert parse_avi_header(avi)["codec"] == "XVID"
    assert decode_avi_frames(avi) is None  # metadata yes, pixels no


def test_video_header_features_covers_avi():
    from signalk_parquet_spark.operators.multimodal import (
        parse_video_header,
        sniff_format,
        video_header_features,
    )

    frames, _ = _jpeg_frames(2)
    avi = make_avi(frames, 16, 16, fps=10)
    assert sniff_format(avi) == "avi"
    assert parse_video_header(avi) == {
        "format": "avi", "width": 16, "height": 16,
        "duration_s": 0.2, "n_tracks": 1,
    }
    assert video_header_features(avi) == [16.0, 16.0, 0.2, 1.0]


def test_frame_sample_features_avi_and_gif(spark):
    """The explode-decode-resize-score pipeline handles BOTH real frame
    sources — MJPEG-AVI and animated GIF — in one pass, dropping
    undecodable rows."""
    from signalk_parquet_spark.operators.multimodal import frame_sample_features

    frames, wants = _jpeg_frames(3)
    avi = make_avi(frames, 16, 16)
    from tests.test_raster import _PALETTE, make_animated_gif

    g1 = np.full((8, 8), 1, dtype=np.uint8)
    g2 = np.full((8, 8), 2, dtype=np.uint8)
    gif = make_animated_gif((8, 8), [(g1, 0, 0, None, 0), (g2, 0, 0, None, 0)], _PALETTE)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(gif)), (3, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    rows = {(r["media_id"], r["frame_idx"]): r for r in
            frame_sample_features(df, every_n=2).collect()}
    assert set(rows) == {(1, 0), (1, 2), (2, 0)}
    assert rows[(1, 0)]["n_frames"] == 3 and rows[(2, 0)]["n_frames"] == 2
    # AVI frame features come from the REAL decoded gray pixels
    from signalk_parquet_spark.operators.raster import resize_box

    want_luma = resize_box(wants[0], 8, 8).astype(np.float64)[:, :, 0]
    np.testing.assert_allclose(
        rows[(1, 0)]["features"],
        [want_luma.mean(), want_luma.std(), want_luma.min(), want_luma.max()],
    )


def test_media_decoders_never_raise_on_corruption():
    """Quarantine contract fuzz: every pure-Python media decoder returns
    None/NaN (never raises) on truncations and byte corruptions of valid
    files. Seeded, deterministic."""
    from signalk_parquet_spark.operators.audio import (
        audio_fingerprint,
        audio_spectral_features,
        decode_wav_samples,
    )
    from signalk_parquet_spark.operators.jpeg import decode_jpeg_pixels
    from signalk_parquet_spark.operators.multimodal import (
        parse_image_header,
        parse_video_header,
    )
    from signalk_parquet_spark.operators.raster import (
        decode_bmp_pixels,
        decode_gif_frames,
        decode_gif_pixels,
    )
    from tests.test_audio import sine, wav_bytes
    from tests.test_raster import _PALETTE, make_animated_gif

    jpeg, _ = _jpeg_frames(1)
    g = np.full((8, 8), 1, dtype=np.uint8)
    samples = {
        "avi": make_avi(jpeg, 16, 16),
        "jpeg": jpeg[0],
        "gif": make_animated_gif((8, 8), [(g, 0, 0, None, 0)], _PALETTE),
        "wav": wav_bytes(sine(700.0, n=2000)),
    }
    decoders = [
        parse_avi_header,
        lambda p: decode_avi_frames(p, max_frames=4),
        decode_jpeg_pixels,
        decode_gif_pixels,
        lambda p: decode_gif_frames(p, max_frames=4),
        decode_bmp_pixels,
        parse_image_header,
        parse_video_header,
        decode_wav_samples,
        audio_spectral_features,
        audio_fingerprint,
    ]
    rng = np.random.RandomState(42)
    for payload in samples.values():
        variants = [payload[:k] for k in range(0, len(payload), max(1, len(payload) // 23))]
        for _ in range(30):
            buf = bytearray(payload)
            for pos in rng.randint(0, len(buf), size=rng.randint(1, 6)):
                buf[pos] = rng.randint(0, 256)
            variants.append(bytes(buf))
        for v in variants:
            for dec in decoders:
                dec(v)  # must not raise — return value unconstrained


def test_video_neardup_pairs(spark):
    """The VIDEO rung: a JPEG re-encode of the same clip (same frames,
    different quantization) matches at a high aligned-frame fraction; a
    clip sharing only its FIRST frame surfaces as a candidate but fails
    the min_frac verify; an unrelated clip never pairs."""
    from signalk_parquet_spark.operators.video import video_neardup_pairs
    from tests.test_jpeg import _test_image, encode_jpeg

    def clip(seeds, q):
        frames = []
        for s in seeds:
            img = _test_image(16, 16, seed=s)
            payload, _ = encode_jpeg([img], 16, 16, [(1, 1)], [[q] * 64])
            frames.append(payload)
        return make_avi(frames, 16, 16)

    df = spark.createDataFrame(
        [
            (1, bytearray(clip([1, 2, 3, 4], q=16))),
            (2, bytearray(clip([1, 2, 3, 4], q=20))),   # re-encode of clip 1
            (3, bytearray(clip([1, 50, 60, 70], q=16))),  # shares ONLY frame 0
            (4, bytearray(clip([80, 81, 82, 83], q=16))),  # unrelated
            (5, bytearray(b"junk")),
        ],
        "media_id long, payload binary",
    )
    rows = {(r["id_a"], r["id_b"]): r for r in video_neardup_pairs(df).collect()}
    assert (1, 2) in rows and rows[(1, 2)]["frac"] >= 0.5
    assert rows[(1, 2)]["n_aligned"] == 4
    assert (1, 3) not in rows  # candidate via frame 0, killed by verify
    assert not any(4 in p or 5 in p for p in rows)
    # loosening min_frac surfaces the single-shared-frame pair
    loose = {(r["id_a"], r["id_b"]): r["n_match"]
             for r in video_neardup_pairs(df, min_frac=0.25).collect()}
    assert loose.get((1, 3)) == 1


def test_video_neardup_survives_corrupt_middle_frame(spark):
    """Alignment is by FRAME INDEX, not list position: a clip with one
    undecodable middle frame must still match its clean twin on the
    remaining aligned frames (regression: a positional zip shifted every
    later frame and killed the pair)."""
    from signalk_parquet_spark.operators.video import video_neardup_pairs
    from tests.test_jpeg import _test_image, encode_jpeg

    frames = [
        encode_jpeg([_test_image(16, 16, seed=s)], 16, 16, [(1, 1)], [[16] * 64])[0]
        for s in (1, 2, 3, 4)
    ]
    broken = list(frames)
    broken[1] = b"\xff\xd8garbage"  # sniffs as JPEG, fails to decode
    df = spark.createDataFrame(
        [
            (1, bytearray(make_avi(frames, 16, 16))),
            (2, bytearray(make_avi(broken, 16, 16))),
        ],
        "media_id long, payload binary",
    )
    rows = {(r["id_a"], r["id_b"]): r for r in video_neardup_pairs(df).collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r["n_aligned"] == 3 and r["n_match"] == 3 and r["frac"] == 1.0


def test_avi_second_stream_video():
    """Real AVIs put audio first: the video stream is then stream 01 and
    its frame chunks are '01dc'. The parser must report video_stream=1
    and the decoder must read the right chunks (and not the audio)."""
    frames, wants = _jpeg_frames(2)
    auds_strh = struct.pack(
        "<4s4sIHHIIIIIIII", b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
        1, 8000, 0, 100, 0, 0, 0,
    ) + b"\x00" * 8
    vids_strh = struct.pack(
        "<4s4sIHHIIIIIIII", b"vids", b"MJPG", 0, 0, 0, 0,
        1, 10, 0, len(frames), 0, 0, 0,
    ) + b"\x00" * 8
    strf_v = struct.pack("<IiiHH4sIiiII", 40, 16, 16, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    avih = struct.pack("<10I", 100000, 0, 0, 0, len(frames), 0, 2, 0, 16, 16) + b"\x00" * 16
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", auds_strh) + _chunk(b"strf", b"\x00" * 16))
        + _list(b"strl", _chunk(b"strh", vids_strh) + _chunk(b"strf", strf_v)),
    )
    movi = _list(
        b"movi",
        _chunk(b"00wb", b"\x01\x02\x03\x04")  # audio chunk, must be ignored
        + b"".join(_chunk(b"01dc", f) for f in frames),
    )
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    meta = parse_avi_header(avi)
    assert meta["video_stream"] == 1 and meta["n_streams"] == 2
    assert meta["codec"] == "MJPG" and meta["n_frames"] == 2
    total, decoded = decode_avi_frames(avi)
    assert total == 2 and len(decoded) == 2
    assert np.array_equal(decoded[0][1], wants[0])


def test_media_pairs_to_decisions(spark):
    """Media dedup end product: pair streams feed the SAME connected-
    components keep/drop machinery as text — a chain (A~B, B~C) keeps
    only A, singletons keep themselves."""
    from signalk_parquet_spark.operators.dedup import pairs_to_decisions

    items = spark.createDataFrame([(i,) for i in range(1, 6)], "media_id long")
    pairs = spark.createDataFrame(
        [(1, 2, 0), (2, 3, 1)], "id_a long, id_b long, hamming long"
    )
    rows = {r["id"]: (r["cluster_rep"], r["kept"])
            for r in pairs_to_decisions(items, pairs).collect()}
    assert rows == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (4, True), 5: (5, True),
    }


def test_video_neardup_min_aligned_floor(spark):
    """A mostly-corrupt clip co-decodable with another on a SINGLE frame
    must not be declared its dup from that one aligned match (regression:
    frac was computed over co-decodable frames only, so n_aligned=1 and
    frac=1.0 passed min_frac)."""
    from signalk_parquet_spark.operators.video import video_neardup_pairs
    from tests.test_jpeg import _test_image, encode_jpeg

    good = [
        encode_jpeg([_test_image(16, 16, seed=s)], 16, 16, [(1, 1)], [[16] * 64])[0]
        for s in (1, 2, 3, 4)
    ]
    mostly_corrupt = [good[0]] + [b"\xff\xd8junk"] * 3
    df = spark.createDataFrame(
        [
            (1, bytearray(make_avi(good, 16, 16))),
            (2, bytearray(make_avi(mostly_corrupt, 16, 16))),
        ],
        "media_id long, payload binary",
    )
    assert video_neardup_pairs(df, min_frac=0.25).count() == 0
    # explicit opt-in to single-frame evidence still works
    assert video_neardup_pairs(df, min_frac=0.25, min_aligned=1).count() == 1


def test_iter_video_chunks_honors_declared_riff_size():
    """Bytes appended past the RIFF header's declared size must not parse
    as phantom frames — even when the junk forms a valid movi LIST."""
    frames, _ = _jpeg_frames(2)
    avi = make_avi(frames, 16, 16)
    phantom = _list(b"movi", _chunk(b"00dc", b"\xff\xd8phantom"))
    assert list(iter_video_chunks(avi + phantom, 0)) == frames
    meta = parse_avi_header(avi + phantom)
    assert meta is not None and meta["n_frames"] == 2


# --- r9: DC-only MJPEG generator + exact-integer luma stats -----------------------


def test_mjpeg_dconly_roundtrip_exact():
    """The generator's whole premise: piecewise-constant blocks + all-ones
    quant survive encode->decode EXACTLY (DC = 8*(v-128) integer, ACs 0)."""
    from signalk_parquet_spark.functions.mediagen import (
        _MJPEG_BLOCKS,
        encode_jpeg_gray_dconly,
        mjpeg_block_value,
    )
    from signalk_parquet_spark.operators.jpeg import decode_jpeg_pixels

    vals = [mjpeg_block_value(3, 1, b) for b in range(_MJPEG_BLOCKS)]
    px = decode_jpeg_pixels(encode_jpeg_gray_dconly(vals, 4, 3))
    assert px is not None and px.shape == (24, 32, 1)
    for b, v in enumerate(vals):
        by, bx = divmod(b, 4)
        block = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0]
        assert (block == v).all(), f"block {b}: {np.unique(block)} != {v}"


def test_mjpeg_payload_decodes_via_container_walk():
    from signalk_parquet_spark.functions.mediagen import (
        _MJPEG_BLOCKS,
        _MJPEG_FRAMES,
        mjpeg_block_value,
        mjpeg_payload_for,
    )

    p = mjpeg_payload_for(9)
    meta = parse_avi_header(p)
    assert meta["codec"] == "MJPG" and meta["n_frames"] == _MJPEG_FRAMES
    total, frames = decode_avi_frames(p, max_frames=8)
    assert total == _MJPEG_FRAMES and len(frames) == _MJPEG_FRAMES
    g = 9 // 4
    for idx, px in frames:
        want = [mjpeg_block_value(g, idx, b) for b in range(_MJPEG_BLOCKS)]
        assert int(px.astype(np.int64).sum()) == 64 * sum(want)
        assert int(px.min()) == min(want) and int(px.max()) == max(want)


def test_video_frame_luma_stats_gray_rgb_and_quarantine(spark):
    """The operator behind the mjpeg_frame_features gate: grayscale MJPEG
    uses the channel directly, RGB (animated GIF) takes the exact
    milli-weight luma, undecodable payloads yield no rows."""
    from signalk_parquet_spark.functions.mediagen import (
        mjpeg_payload_for,
        video_payload_for,
    )
    from signalk_parquet_spark.operators.raster import decode_gif_frames
    from signalk_parquet_spark.operators.video import video_frame_luma_stats

    gif = video_payload_for(0)
    rows = [(1, bytearray(mjpeg_payload_for(4))), (2, bytearray(gif)),
            (3, bytearray(b"not media at all"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r["id"], r["frame_idx"]): r
        for r in video_frame_luma_stats(df, max_frames=8).collect()
    }
    assert not any(k[0] == 3 for k in got)  # quarantined
    assert sum(1 for k in got if k[0] == 1) == 4  # 4 MJPEG frames
    # RGB GIF frame 0: stats must equal the direct decode's integer luma
    f0 = decode_gif_frames(gif, max_frames=1)[0].astype(np.int64)
    luma = 299 * f0[:, :, 0] + 587 * f0[:, :, 1] + 114 * f0[:, :, 2]
    r = got[(2, 0)]
    assert (r["luma_sum"], r["luma_min"], r["luma_max"]) == (
        int(luma.sum()), int(luma.min()), int(luma.max())
    )
