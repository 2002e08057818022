"""The media keep/drop gates' foundations: mediagen encoders round-trip
through the repo's own decoders, cross-format dHash parity holds, and the
pair screen recovers exactly the planted group structure."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from signalk_parquet_spark.functions.mediagen import (
    encode_bmp_gray_as_rgb24,
    encode_png_gray,
    group_pixels,
    payload_for,
)
from signalk_parquet_spark.operators.multimodal import (
    decode_image_pixels,
    image_dhash,
    image_neardup_pairs,
)


def test_encoders_round_trip_through_repo_decoders():
    px = group_pixels(42)
    d_png = decode_image_pixels(encode_png_gray(px))
    d_bmp = decode_image_pixels(encode_bmp_gray_as_rgb24(px))
    assert d_png is not None and d_bmp is not None
    assert np.array_equal(d_png[:, :, 0], px)
    # BMP ships gray replicated to RGB; all three channels must survive
    for c in range(3):
        assert np.array_equal(d_bmp[:, :, c], px)


def test_cross_format_dhash_identical():
    for g in (0, 7, 123):
        px = group_pixels(g)
        assert image_dhash(encode_png_gray(px)) == image_dhash(
            encode_bmp_gray_as_rgb24(px)
        )


def test_cross_group_hashes_are_far_apart():
    # the plant is exact only if distinct groups never fall inside the
    # verify radius (3); uniform noise keeps them ~32 bits apart
    hs = [image_dhash(encode_png_gray(group_pixels(g))) for g in range(64)]
    mask = (1 << 64) - 1
    mind = min(
        bin((a ^ b) & mask).count("1")
        for i, a in enumerate(hs)
        for b in hs[i + 1 :]
    )
    assert mind > 3, f"cross-group Hamming {mind} inside verify radius"


def test_pair_screen_recovers_planted_groups_exactly(spark):
    n, group = 24, 4
    rows = [(i, payload_for(i, group)) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in image_neardup_pairs(
            df, id_col="doc_id", payload_col="payload", max_hamming=3, bands=4
        ).collect()
    }
    expected = {
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if a // group == b // group
    }
    assert pairs == expected


def test_audio_variants_fingerprint_identical():
    """mono vs stereo-L=R must be BIT-identical (channel mean of equal
    floats), and cross-group noise must share no sub-fingerprints — the
    two facts the audio gate's exactness rests on."""
    from signalk_parquet_spark.functions.mediagen import audio_payload_for
    from signalk_parquet_spark.operators.audio import audio_fingerprint

    f_mono, f_stereo = audio_fingerprint(audio_payload_for(0)), audio_fingerprint(
        audio_payload_for(1)
    )
    assert f_mono and f_mono == f_stereo
    f_other = audio_fingerprint(audio_payload_for(4))  # group 1
    assert sum(a == b for a, b in zip(f_mono, f_other)) == 0


def test_video_palette_permutation_decodes_to_same_rgb():
    from signalk_parquet_spark.functions.mediagen import video_payload_for
    from signalk_parquet_spark.operators.multimodal import dhash_pixels
    from signalk_parquet_spark.operators.raster import decode_gif_frames

    fr_id = decode_gif_frames(video_payload_for(0))
    fr_perm = decode_gif_frames(video_payload_for(1))
    assert len(fr_id) == len(fr_perm) == 4
    for a, b in zip(fr_id, fr_perm):
        assert np.array_equal(a, b)
    # and the bytes really differ (the permutation exercises palette decode)
    assert video_payload_for(0) != video_payload_for(1)
    h_a = [dhash_pixels(f) for f in fr_id]
    h_other = [dhash_pixels(f) for f in decode_gif_frames(video_payload_for(4))]
    mask = (1 << 64) - 1
    assert min(bin((x ^ y) & mask).count("1") for x in h_a for y in h_other) > 3


def test_decisions_match_planted_truth(spark, sf_smoke):
    from signalk_parquet_spark.queries_media import image_dedup_decisions

    got = {
        r["id"]: (r["cluster_rep"], r["kept"])
        for r in image_dedup_decisions(spark, sf_smoke).collect()
    }
    ids = sorted(got)
    for i in ids:
        members = [j for j in ids if j // 4 == i // 4]
        rep = min(members)
        assert got[i] == (rep, i == rep)
