"""GIF/BMP pixel decoders (operators/raster.py). LZW and BMP are lossless,
so every assertion here is exact equality — synthetic files against the
source pixels, real files against Java ImageIO bit-for-bit."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pytest

from signalk_parquet_spark.operators.raster import (
    decode_bmp_pixels,
    decode_gif_pixels,
)

# --- minimal GIF encoder (uncompressed-style LZW: emit literal codes, send
# CLEAR before the dictionary would force a wider code) ----------------------


def _lzw_encode_literals(min_code: int, indices) -> bytes:
    clear = 1 << min_code
    end = clear + 1
    code_size = min_code + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    dict_size = end + 1
    for v in indices:
        put(int(v))
        dict_size += 1
        if dict_size == (1 << code_size) - 1:  # stay at the fixed width
            put(clear)
            dict_size = end + 1
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def make_gif(indices, palette, interlaced=False, transparent=None) -> bytes:
    h, w = indices.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    pal = np.zeros((2 << size_field, 3), dtype=np.uint8)
    pal[:n] = palette
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlaced else 0)
    rows = indices
    if interlaced:
        order = []
        for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            order.extend(range(start, h, step))
        rows = indices[order]
    min_code = max(2, size_field + 1)
    out.append(min_code)
    out += _sub_blocks(_lzw_encode_literals(min_code, rows.flatten()))
    out += bytes([0x3B])
    return bytes(out)


def make_bmp(img: np.ndarray, bpp: int, top_down=False, palette=None) -> bytes:
    h, w = img.shape[:2]
    stride = (w * (bpp // 8) + 3) & ~3
    pal_bytes = b""
    if bpp == 8:
        pal = np.zeros((256, 4), dtype=np.uint8)
        pal[: len(palette), :3] = palette[:, [2, 1, 0]]  # RGB -> BGRx
        pal_bytes = pal.tobytes()
    data_off = 14 + 40 + len(pal_bytes)
    body = bytearray()
    rows = img if top_down else img[::-1]
    for r in range(h):
        if bpp == 8:
            line = rows[r].tobytes()
        elif bpp == 24:
            line = rows[r][:, [2, 1, 0]].tobytes()  # RGB -> BGR
        else:
            line = rows[r][:, [2, 1, 0, 3]].tobytes()  # RGBA -> BGRA
        body += line + b"\x00" * (stride - len(line))
    out = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp, 0,
        len(body), 2835, 2835, 256 if bpp == 8 else 0, 0,
    )
    return out + pal_bytes + bytes(body)


_PALETTE = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 0],
     [0, 255, 255], [255, 0, 255], [200, 100, 50]], dtype=np.uint8
)


def test_gif_synthetic_lzw_roundtrip_exact():
    rng = np.random.RandomState(4)
    idx = rng.randint(0, 8, size=(17, 23)).astype(np.uint8)
    got = decode_gif_pixels(make_gif(idx, _PALETTE))
    assert got is not None and got.shape == (17, 23, 3)
    assert np.array_equal(got, _PALETTE[idx])


def test_gif_interlaced_and_transparent_exact():
    rng = np.random.RandomState(9)
    idx = rng.randint(0, 8, size=(16, 10)).astype(np.uint8)
    got = decode_gif_pixels(make_gif(idx, _PALETTE, interlaced=True, transparent=3))
    assert got is not None and got.shape == (16, 10, 4)
    assert np.array_equal(got[:, :, :3], _PALETTE[idx])
    assert np.array_equal(got[:, :, 3], np.where(idx == 3, 0, 255))


def test_gif_real_files_match_imageio_bit_for_bit(spark):
    """LZW is lossless: the decoder must agree with Java ImageIO EXACTLY on
    real GIF files (including palette lookup and RGBA transparency)."""
    paths = sorted(glob.glob("/root/miniconda/lib/tk8.6/images/*.gif"))
    if not paths:
        pytest.skip("no sample GIFs on this machine")
    rows = spark.read.format("image").load(paths).select("image.*").collect()
    compared = 0
    rgba_seen = 0
    for r in rows:
        raw = open(r["origin"].replace("file:", ""), "rb").read()
        mine = decode_gif_pixels(raw)
        assert mine is not None, r["origin"]
        nch = r["nChannels"]
        ref = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(
            r["height"], r["width"], nch
        )
        ref = ref[:, :, [2, 1, 0]] if nch == 3 else ref[:, :, [2, 1, 0, 3]]
        assert mine.shape == ref.shape, r["origin"]
        assert np.array_equal(mine, ref), r["origin"]
        compared += 1
        rgba_seen += nch == 4
    assert compared >= 3 and rgba_seen >= 1


@pytest.mark.parametrize("bpp,top_down", [(24, False), (24, True), (32, False)])
def test_bmp_truecolor_roundtrip_exact(bpp, top_down):
    rng = np.random.RandomState(bpp + top_down)
    c = 4 if bpp == 32 else 3
    img = rng.randint(0, 256, size=(9, 13, c)).astype(np.uint8)
    got = decode_bmp_pixels(make_bmp(img, bpp, top_down=top_down))
    assert got is not None
    assert np.array_equal(got, img)


def test_bmp_palette_roundtrip_exact():
    rng = np.random.RandomState(12)
    idx = rng.randint(0, 8, size=(7, 11)).astype(np.uint8)
    got = decode_bmp_pixels(make_bmp(idx, 8, palette=_PALETTE))
    assert got is not None
    assert np.array_equal(got, _PALETTE[idx])


def test_bmp_generated_file_matches_imageio(spark, tmp_path):
    """Sanity that make_bmp writes REAL BMPs: Java ImageIO reads one back
    bit-for-bit, so the round-trip above isn't two mirrored bugs."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(12, 12, 3)).astype(np.uint8)
    p = tmp_path / "x.bmp"
    p.write_bytes(make_bmp(img, 24))
    r = spark.read.format("image").load(str(p)).select("image.*").collect()[0]
    ref = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(
        r["height"], r["width"], r["nChannels"]
    )[:, :, [2, 1, 0]]
    assert np.array_equal(ref, img)
    assert np.array_equal(decode_bmp_pixels(p.read_bytes()), img)


def test_unsupported_variants_return_none():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(4, 4, 3)).astype(np.uint8)
    bmp = bytearray(make_bmp(img, 24))
    bmp[30] = 1  # BI_RLE8 compression
    assert decode_bmp_pixels(bytes(bmp)) is None
    bmp = bytearray(make_bmp(img, 24))
    bmp[28] = 16  # 16 bpp
    assert decode_bmp_pixels(bytes(bmp)) is None
    gif = make_gif(np.zeros((4, 4), dtype=np.uint8), _PALETTE)
    assert decode_gif_pixels(gif[:20]) is None  # truncated before image data
    assert decode_gif_pixels(b"GIF89a") is None
    assert decode_bmp_pixels(b"BM") is None


def test_image_pixel_features_scores_gif_and_bmp():
    from signalk_parquet_spark.operators.multimodal import image_pixel_features

    idx = np.tile(np.arange(8, dtype=np.uint8), (8, 1))
    f_gif = image_pixel_features(make_gif(idx, _PALETTE))
    assert f_gif[:3] == [8.0, 8.0, 3.0] and not np.isnan(f_gif[3])
    img = _PALETTE[idx]
    f_bmp = image_pixel_features(make_bmp(img, 24))
    assert f_bmp[:3] == [8.0, 8.0, 3.0] and f_bmp[3] == f_gif[3]


def make_animated_gif(screen_hw, frames, palette) -> bytes:
    """frames: list of (indices, left, top, transparent, disposal)."""
    h, w = screen_hw
    n = len(palette)
    size_field = max(1, (n - 1).bit_length()) - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    pal = np.zeros((2 << size_field, 3), dtype=np.uint8)
    pal[:n] = palette
    out += pal.tobytes()
    min_code = max(2, size_field + 1)
    for idx, left, top, transparent, disposal in frames:
        fh, fw = idx.shape
        packed = (disposal << 2) | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, packed, 0, 0, transparent or 0, 0])
        out += struct.pack("<BHHHHB", 0x2C, left, top, fw, fh, 0)
        out.append(min_code)
        out += _sub_blocks(_lzw_encode_literals(min_code, idx.flatten()))
    out += bytes([0x3B])
    return bytes(out)


def test_gif_animation_compositing_exact():
    """Three frames exercising the GIF89a animation model: a partial-rect
    draw with transparency (frame 2 leaves frame 1's pixels showing
    through), then disposal=2 restoring background under frame 3."""
    from signalk_parquet_spark.operators.raster import decode_gif_frames

    f1 = np.full((8, 8), 1, dtype=np.uint8)           # all red
    f2 = np.full((4, 4), 2, dtype=np.uint8)           # green block at (2,2)
    f2[1, 1] = 7                                      # transparent hole
    f3 = np.full((2, 2), 4, dtype=np.uint8)           # yellow block at (0,0)
    gif = make_animated_gif(
        (8, 8),
        [
            (f1, 0, 0, None, 0),
            (f2, 2, 2, 7, 2),   # transparent idx 7, disposal: restore bg
            (f3, 0, 0, None, 0),
        ],
        _PALETTE,
    )
    frames = decode_gif_frames(gif)
    assert frames is not None and len(frames) == 3
    # frame 1: all red
    want1 = np.broadcast_to(_PALETTE[1], (8, 8, 3))
    assert np.array_equal(frames[0], want1)
    # frame 2: red canvas, green 4x4 at (2,2) with the hole showing red
    want2 = want1.copy()
    want2[2:6, 2:6] = _PALETTE[2]
    want2[3, 3] = _PALETTE[1]
    assert np.array_equal(frames[1], want2)
    # frame 3: disposal=2 restored bg (palette[0]) under frame 2's rect
    want3 = want1.copy()
    want3[2:6, 2:6] = _PALETTE[0]
    want3[0:2, 0:2] = _PALETTE[4]
    assert np.array_equal(frames[2], want3)


def test_resize_box_exact_integer_means():
    from signalk_parquet_spark.operators.raster import resize_box

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)[:, :, None].repeat(3, axis=2)
    out = resize_box(px, 2, 2)
    assert out.shape == (2, 2, 3)
    # each quadrant's floor-mean, computed independently
    for oy in range(2):
        for ox in range(2):
            box = px[oy * 4 : oy * 4 + 4, ox * 4 : ox * 4 + 4, 0].astype(int)
            assert out[oy, ox, 0] == box.sum() // box.size
    # non-divisible shapes: 5x3 -> 2x2 exercises uneven box edges
    odd = np.arange(15, dtype=np.uint8).reshape(5, 3)
    got = resize_box(odd, 2, 2)
    ys, xs = [0, 2, 5], [0, 1, 3]
    for oy in range(2):
        for ox in range(2):
            box = odd[ys[oy] : ys[oy + 1], xs[ox] : xs[ox + 1]].astype(int)
            assert got[oy, ox] == box.sum() // box.size


def test_frame_sample_features_operator(spark):
    """The explode-decode-resize-score pipeline over a media DataFrame:
    an animated GIF yields one row per sampled frame; a non-GIF payload
    yields none."""
    from signalk_parquet_spark.operators.multimodal import frame_sample_features

    f1 = np.full((8, 8), 1, dtype=np.uint8)
    f2 = np.full((8, 8), 3, dtype=np.uint8)
    gif = make_animated_gif((8, 8), [(f1, 0, 0, None, 0), (f2, 0, 0, None, 0)], _PALETTE)
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"not media"))],
        "media_id long, payload binary",
    )
    rows = {(r["media_id"], r["frame_idx"]): r for r in
            frame_sample_features(df, every_n=1, max_frames=8).collect()}
    assert set(rows) == {(1, 0), (1, 1)}
    assert rows[(1, 0)]["n_frames"] == 2
    # frame 1 is solid red, frame 2 solid blue: luma means differ, stds 0
    m1, s1 = rows[(1, 0)]["features"][:2]
    m2, s2 = rows[(1, 1)]["features"][:2]
    assert s1 < 1e-9 and s2 < 1e-9 and m1 != m2  # std of a solid frame ~ 0 (fp residue)


# --- perceptual hash (dHash) + cross-format image near-dup ---------------------


def _gradient_rgb(h=32, w=32, seed=1):
    rng = np.random.RandomState(seed)
    base = np.linspace(0, 255, w)[None, :, None] * np.ones((h, 1, 3))
    return np.clip(base + rng.randint(-30, 30, size=(h, w, 3)), 0, 255).astype(np.uint8)


def test_image_dhash_cross_format_identical():
    """PNG/BMP decode losslessly, so the SAME pixels in either container
    hash to the SAME 64 bits; an unrelated image is far away; junk is
    None."""
    from signalk_parquet_spark.operators.multimodal import image_dhash
    from tests.test_thresholds_lifecycle import _png_with_pixels

    img = _gradient_rgb()
    h_png = image_dhash(_png_with_pixels(img, color_type=2, filters=[0]))
    h_bmp = image_dhash(make_bmp(img, 24))
    assert h_png is not None and h_png == h_bmp
    other = image_dhash(make_bmp(_gradient_rgb(seed=99)[::-1, ::-1], 24))
    assert other is not None and bin((h_png ^ other) & ((1 << 64) - 1)).count("1") > 8
    assert image_dhash(b"junk") is None
    # paletted GIF of the same indices as an 8-bit BMP with the same
    # palette: identical RGB decode -> identical hash
    idx = (np.arange(64, dtype=np.uint8).reshape(8, 8)) % len(_PALETTE)
    h_gif = image_dhash(make_gif(idx, _PALETTE))
    h_bmp8 = image_dhash(make_bmp(idx, 8, palette=_PALETTE))
    assert h_gif is not None and h_gif == h_bmp8


def test_image_neardup_pairs_cross_format_and_jpeg(spark):
    """The dHash band join finds: the PNG/BMP twins at Hamming 0 (cross-
    format dedup), the JPEG re-encode within the probe radius, and not the
    unrelated image. Pigeonhole guarantee: bands=4 > max_hamming=3 makes
    recall exact."""
    from signalk_parquet_spark.operators.multimodal import (
        image_dhash,
        image_neardup_pairs,
    )
    from tests.test_jpeg import _QLUMA, _rgb_to_ycbcr, encode_jpeg
    from tests.test_thresholds_lifecycle import _png_with_pixels

    img = _gradient_rgb()
    y, cb, cr = _rgb_to_ycbcr(img.astype(np.float64))
    jpeg, _ = encode_jpeg([y, cb, cr], 32, 32, [(1, 1)] * 3, [_QLUMA, [24] * 64])
    ham_jpeg = bin(
        (image_dhash(_png_with_pixels(img, color_type=2, filters=[0]))
         ^ image_dhash(jpeg)) & ((1 << 64) - 1)
    ).count("1")
    df = spark.createDataFrame(
        [
            (1, bytearray(_png_with_pixels(img, color_type=2, filters=[0]))),
            (2, bytearray(make_bmp(img, 24))),
            (3, bytearray(jpeg)),
            (4, bytearray(make_bmp(_gradient_rgb(seed=99)[::-1, ::-1], 24))),
            (5, bytearray(b"not an image")),
        ],
        "media_id long, payload binary",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_neardup_pairs(df).collect()}
    assert pairs.get((1, 2)) == 0  # cross-format exact dup
    if ham_jpeg <= 3:  # lossy re-encode: pinned only when within the radius
        assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def test_image_dhash_tiny_images_stay_distinct():
    """Images smaller than the 8x9 hash grid must not collapse: the
    resize replicates pixels instead of producing empty (divide-by-zero)
    boxes, so distinct 4x4 images keep distinct hashes (regression: they
    all hashed identically and were falsely deduplicated)."""
    import warnings

    from signalk_parquet_spark.operators.multimodal import image_dhash
    from signalk_parquet_spark.operators.raster import resize_box

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        hs = set()
        for seed in range(6):
            img = np.random.RandomState(seed).randint(0, 256, (4, 4, 3)).astype(np.uint8)
            hs.add(image_dhash(make_bmp(img, 24)))
        assert len(hs) == 6
        # and resize_box on frames smaller than the thumb: exact tiling
        p = np.array([[10, 20], [30, 40]], dtype=np.uint8)[:, :, None]
        r = resize_box(p, 4, 4)
        assert (r[0, 0, 0], r[0, 3, 0], r[3, 0, 0], r[3, 3, 0]) == (10, 20, 30, 40)


def test_image_phash_second_lens():
    """pHash: cross-format identity like dHash, unrelated images far
    apart — and the second-lens property on the content class dHash is
    MEASURABLY weak on (flat blocks: every adjacent-pixel comparison is a
    tie that JPEG requantization flips, re-encode Hamming up to ~21):
    pHash's re-encode distances stay strictly BELOW its unrelated-image
    distances (clean threshold exists), while dHash's two ranges overlap
    (no threshold separates them)."""
    from tests.test_jpeg import encode_jpeg
    from signalk_parquet_spark.operators.multimodal import (
        image_dhash,
        image_phash,
    )

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    img = _gradient_rgb(seed=3)
    h_bmp = image_phash(make_bmp(img, 24))
    from tests.test_thresholds_lifecycle import _png_with_pixels

    assert h_bmp == image_phash(_png_with_pixels(img, color_type=2, filters=[0]))
    assert image_phash(b"junk") is None

    def block_img(seed):
        rng = np.random.RandomState(seed)
        return np.kron(
            rng.randint(0, 256, size=(4, 4)).astype(np.float64), np.ones((4, 4))
        )

    d_re, d_un, p_re, p_un = [], [], [], []
    for s in range(5):
        a16 = encode_jpeg([block_img(s)], 16, 16, [(1, 1)], [[16] * 64])[0]
        a20 = encode_jpeg([block_img(s)], 16, 16, [(1, 1)], [[20] * 64])[0]
        oth = encode_jpeg([block_img(s + 50)], 16, 16, [(1, 1)], [[16] * 64])[0]
        d_re.append(ham(image_dhash(a16), image_dhash(a20)))
        d_un.append(ham(image_dhash(a16), image_dhash(oth)))
        p_re.append(ham(image_phash(a16), image_phash(a20)))
        p_un.append(ham(image_phash(a16), image_phash(oth)))
    assert max(p_re) < min(p_un)  # pHash: a clean threshold exists
    assert max(d_re) >= min(d_un) - 4  # dHash: ranges (nearly) overlap here


def test_image_neardup_pairs_phash_method(spark):
    from signalk_parquet_spark.operators.multimodal import image_neardup_pairs
    from tests.test_thresholds_lifecycle import _png_with_pixels

    img = _gradient_rgb(seed=9)
    df = spark.createDataFrame(
        [
            (1, bytearray(_png_with_pixels(img, color_type=2, filters=[0]))),
            (2, bytearray(make_bmp(img, 24))),
            (3, bytearray(make_bmp(_gradient_rgb(seed=55)[::-1, ::-1].copy(), 24))),
        ],
        "media_id long, payload binary",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in image_neardup_pairs(df, method="phash").collect()}
    assert pairs == {(1, 2): 0}


def test_gif_animation_random_compositing_differential():
    """Seeded random animations (frame rects at offsets, transparency
    holes, all disposal methods) decoded by decode_gif_frames must equal
    an INDEPENDENT numpy replication of the GIF89a compositing model."""
    from signalk_parquet_spark.operators.raster import decode_gif_frames

    rng = np.random.RandomState(123)
    for trial in range(8):
        h = w = int(rng.randint(6, 12))
        n_frames = int(rng.randint(1, 5))
        frames = []
        for _ in range(n_frames):
            fh = int(rng.randint(1, h + 1))
            fw = int(rng.randint(1, w + 1))
            top = int(rng.randint(0, h - fh + 1))
            left = int(rng.randint(0, w - fw + 1))
            idx = rng.randint(0, len(_PALETTE), size=(fh, fw)).astype(np.uint8)
            transparent = int(rng.randint(0, len(_PALETTE))) if rng.rand() < 0.5 else None
            disposal = int(rng.choice([0, 1, 2, 3]))
            frames.append((idx, left, top, transparent, disposal))
        gif = make_animated_gif((h, w), frames, _PALETTE)
        got = decode_gif_frames(gif)
        assert got is not None and len(got) == n_frames, trial

        # independent compositor
        bg = _PALETTE[0]
        canvas = np.broadcast_to(bg, (h, w, 3)).astype(np.uint8).copy()
        for k, (idx, left, top, transparent, disposal) in enumerate(frames):
            fh, fw = idx.shape
            before = canvas[top : top + fh, left : left + fw].copy()
            rgb = _PALETTE[idx]
            region = canvas[top : top + fh, left : left + fw]
            if transparent is not None:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:, :] = rgb
            assert np.array_equal(got[k], canvas), (trial, k)
            if disposal == 2:
                canvas[top : top + fh, left : left + fw] = bg
            elif disposal == 3:
                canvas[top : top + fh, left : left + fw] = before
