"""Baseline JPEG decoder (operators/jpeg.py): exact round-trip tests.

The test file carries its own minimal baseline JPEG ENCODER (markers,
canonical Huffman, zigzag, DCT + quantization, byte stuffing, restart
markers) so the decoder is exercised end-to-end on independently-built
bitstreams. Exactness: the expected image is reconstructed from the
encoder's own quantized coefficients through the decoder module's public
idct_block/ycbcr_to_rgb arithmetic, so every test asserts EQUALITY, not a
tolerance — any bitstream, Huffman, zigzag, predictor, or upsampling slip
shows up as a hard mismatch.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from signalk_parquet_spark.operators.jpeg import (
    ZIGZAG,
    _build_huffman,
    _dct_matrix,
    decode_jpeg_pixels,
    idct_block,
    ycbcr_to_rgb,
)

# --- encoder-side Huffman: uniform-length canonical tables ---------------------
# DC alphabet 0..11 at code length 4 (12 <= 2^4), AC alphabet (EOB, ZRL, all
# run/size pairs) at code length 8 (162 <= 2^8). Valid canonical tables the
# decoder must accept like any DHT.
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_COUNTS = [0] * 16
_AC_COUNTS[7] = len(_AC_SYMBOLS)  # all at length 8


def _enc_table(counts, symbols):
    return {sym: (ln, code) for (ln, code), sym in _build_huffman(counts, symbols).items()}


_DC_ENC = _enc_table(_DC_COUNTS, _DC_SYMBOLS)
_AC_ENC = _enc_table(_AC_COUNTS, _AC_SYMBOLS)

_QLUMA = [16] * 64  # flat tables keep quantization meaningful but mild
_QCHROMA = [24] * 64


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _quantize_block(block, qtab):
    """block: 8x8 float spatial (already level-shifted input minus 128).
    Returns 64 ints in zigzag order."""
    m = _dct_matrix()
    f = m @ block @ m.T
    out = []
    for k in range(64):
        r, c = ZIGZAG[k]
        out.append(int(np.floor(f[r, c] / qtab[k] + 0.5)))
    return out


def _encode_block(bw, zz, pred, dc_enc=_DC_ENC, ac_enc=_AC_ENC):
    dc_diff = zz[0] - pred
    s = abs(dc_diff).bit_length()
    ln, code = dc_enc[s]
    bw.put(code, ln)
    if s:
        v = dc_diff if dc_diff >= 0 else dc_diff + (1 << s) - 1
        bw.put(v, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            bw.put(code, ln)
            run -= 16
        s = abs(zz[k]).bit_length()
        ln, code = ac_enc[(run << 4) | s]
        bw.put(code, ln)
        v = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
        bw.put(v, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_enc[0x00]  # EOB
        bw.put(code, ln)
    return zz[0]


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt(tid, table):
    return _seg(0xDB, bytes([tid]) + bytes(table))


def _dht(tc, th, counts, symbols):
    return _seg(0xC4, bytes([(tc << 4) | th] + counts + symbols))


def _blocks_of(plane):
    """plane: (H, W) float, H and W multiples of 8 -> yields (by, bx, 8x8)."""
    h, w = plane.shape
    for by in range(h // 8):
        for bx in range(w // 8):
            yield by, bx, plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]


def _pad_to(plane, mh, mw):
    h, w = plane.shape
    out = np.zeros((mh, mw), dtype=np.float64)
    out[:h, :w] = plane
    if h < mh:
        out[h:, :w] = plane[h - 1 : h, :]
    if w < mw:
        out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg(planes, h, w, sampling, qtabs, restart_interval=0,
                dht_specs=None, table_ids=None, emit_dht=True):
    """Minimal baseline encoder. planes: list of (H_c, W_c) float arrays
    already at their component resolution (values 0..255); sampling:
    [(hi, vi)] per component; qtabs: per-component zigzag quant tables.
    Returns (jpeg_bytes, expected_planes) where expected_planes are the
    decoder-arithmetic reconstructions at component resolution.

    dht_specs: optional {(tc, th): (counts, symbols)} overriding the
    default uniform-length tables; table_ids: per-component (dc_id, ac_id)
    (default all (0, 0)); emit_dht=False omits every DHT segment (the
    MJPEG no-tables convention — decoder must fall back to Annex K)."""
    ncomp = len(planes)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for ci in range(ncomp):
        ch, cv = sampling[ci]
        padded.append(_pad_to(planes[ci], mcuy * 8 * cv, mcux * 8 * ch))
    expected = [np.zeros_like(p, dtype=np.uint8) for p in padded]

    if table_ids is None:
        table_ids = [(0, 0)] * ncomp
    if dht_specs is None:
        dht_specs = {(0, 0): (_DC_COUNTS, _DC_SYMBOLS),
                     (1, 0): (_AC_COUNTS, _AC_SYMBOLS)}
    enc = {key: _enc_table(*spec) for key, spec in dht_specs.items()}

    out = bytearray(b"\xff\xd8")
    out += _dqt(0, qtabs[0])
    if ncomp > 1:
        out += _dqt(1, qtabs[1])
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, (sampling[ci][0] << 4) | sampling[ci][1],
                      0 if ci == 0 else 1])
    out += _seg(0xC0, sof)
    if emit_dht:
        for (tc, th), (counts, symbols) in sorted(dht_specs.items()):
            out += _dht(tc, th, list(counts), list(symbols))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (table_ids[ci][0] << 4) | table_ids[ci][1]])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * ncomp
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            ch, cv = sampling[ci]
            q = qtabs[0] if ci == 0 else qtabs[1]
            for by in range(cv):
                for bx in range(ch):
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    block = padded[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    zz = _quantize_block(block, q)
                    pred[ci] = _encode_block(
                        bw, zz, pred[ci],
                        enc[(0, table_ids[ci][0])], enc[(1, table_ids[ci][1])],
                    )
                    coef = np.zeros((8, 8), dtype=np.float64)
                    for k in range(64):
                        r, c = ZIGZAG[k]
                        coef[r, c] = zz[k] * q[k]
                    expected[ci][y0 : y0 + 8, x0 : x0 + 8] = idct_block(coef)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out), expected


def _rgb_to_ycbcr(rgb):
    r, g, b = (rgb[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _test_image(h, w, seed=7):
    rng = np.random.RandomState(seed)
    base = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    return np.clip(base + rng.randint(-40, 40, size=(h, w)), 0, 255).astype(np.float64)


def test_grayscale_roundtrip_exact():
    img = _test_image(16, 24)
    payload, expected = encode_jpeg([img], 16, 24, [(1, 1)], [_QLUMA])
    got = decode_jpeg_pixels(payload)
    assert got is not None and got.shape == (16, 24, 1)
    assert np.array_equal(got[:, :, 0], expected[0][:16, :24])
    # and the lossy result is still close to the source (sanity on Q=16)
    assert np.abs(got[:, :, 0].astype(float) - img).mean() < 12


def test_rgb_444_roundtrip_exact():
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(16, 16, 3)).astype(np.float64)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    payload, exp = encode_jpeg(
        [y, cb, cr], 16, 16, [(1, 1)] * 3, [_QLUMA, _QCHROMA]
    )
    got = decode_jpeg_pixels(payload)
    assert got is not None and got.shape == (16, 16, 3)
    want = ycbcr_to_rgb(
        exp[0][:16, :16].astype(np.float64),
        exp[1][:16, :16].astype(np.float64),
        exp[2][:16, :16].astype(np.float64),
    )
    assert np.array_equal(got, want)


def test_rgb_420_subsampled_roundtrip_exact():
    img = _test_image(16, 32, seed=3)
    rgb = np.stack([img, np.flipud(img), np.fliplr(img)], axis=-1)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    # encoder-side 2x2 mean subsampling of the chroma planes
    cb2 = cb.reshape(8, 2, 16, 2).mean(axis=(1, 3))
    cr2 = cr.reshape(8, 2, 16, 2).mean(axis=(1, 3))
    payload, exp = encode_jpeg(
        [y, cb2, cr2], 16, 32, [(2, 2), (1, 1), (1, 1)], [_QLUMA, _QCHROMA]
    )
    got = decode_jpeg_pixels(payload)
    assert got is not None and got.shape == (16, 32, 3)
    want = ycbcr_to_rgb(
        exp[0][:16, :32].astype(np.float64),
        exp[1].repeat(2, axis=0).repeat(2, axis=1)[:16, :32].astype(np.float64),
        exp[2].repeat(2, axis=0).repeat(2, axis=1)[:16, :32].astype(np.float64),
    )
    assert np.array_equal(got, want)


def test_restart_markers_reset_predictors():
    img = _test_image(8, 64, seed=5)  # 8 MCUs in one row
    payload, expected = encode_jpeg(
        [img], 8, 64, [(1, 1)], [_QLUMA], restart_interval=2
    )
    assert b"\xff\xd0" in payload  # RST0 actually emitted
    got = decode_jpeg_pixels(payload)
    assert got is not None
    assert np.array_equal(got[:, :, 0], expected[0][:8, :64])


def test_unsupported_modes_and_garbage_return_none():
    img = _test_image(8, 8)
    payload, _ = encode_jpeg([img], 8, 8, [(1, 1)], [_QLUMA])
    # lossless (SOF3) and arithmetic-coded (SOF9): refuse, don't misparse
    assert decode_jpeg_pixels(payload.replace(b"\xff\xc0", b"\xff\xc3", 1)) is None
    assert decode_jpeg_pixels(payload.replace(b"\xff\xc0", b"\xff\xc9", 1)) is None
    assert decode_jpeg_pixels(payload[: len(payload) // 2]) is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None
    assert decode_jpeg_pixels(b"not a jpeg") is None


def test_progressive_scan_split_roundtrip_exact():
    """Progressive (SOF2) color round-trip: the same quantized coefficients
    delivered over FOUR scans (interleaved DC-first, then one AC-first scan
    per component, T.81 Annex G) must reconstruct the identical image a
    single baseline scan produces — built block-by-block here, decoded
    whole-file there."""
    rng = np.random.RandomState(23)
    rgb = rng.randint(0, 256, size=(16, 16, 3)).astype(np.float64)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    planes = [y, cb, cr]
    qtabs = [_QLUMA, _QCHROMA]
    # per-plane quantized coefficients + expected reconstruction
    zz_all = []
    expected = []
    for ci, pl in enumerate(planes):
        q = qtabs[0] if ci == 0 else qtabs[1]
        blocks = []
        exp = np.zeros((16, 16), dtype=np.uint8)
        for by in range(2):
            row = []
            for bx in range(2):
                blk = pl[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                zz = _quantize_block(blk, q)
                row.append(zz)
                coef = np.zeros((8, 8))
                for k in range(64):
                    r, c = ZIGZAG[k]
                    coef[r, c] = zz[k] * q[k]
                exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = idct_block(coef)
            blocks.append(row)
        zz_all.append(blocks)
        expected.append(exp)

    out = bytearray(b"\xff\xd8")
    out += _dqt(0, _QLUMA) + _dqt(1, _QCHROMA)
    sof = bytes([8]) + struct.pack(">HH", 16, 16) + bytes([3])
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += bytes([0xFF, 0xC2]) + struct.pack(">H", len(sof) + 2) + sof
    out += _dht(0, 0, _DC_COUNTS, _DC_SYMBOLS)
    out += _dht(1, 0, _AC_COUNTS, _AC_SYMBOLS)

    def sos(comp_ids, ss, se):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, 0x00])  # Ah=Al=0
        return _seg(0xDA, body)

    # scan 1: interleaved DC for all components
    out += sos([1, 2, 3], 0, 0)
    bw = _BitWriter()
    pred = [0, 0, 0]
    for mcu in range(4):
        my, mx = divmod(mcu, 2)
        for ci in range(3):
            zz = zz_all[ci][my][mx]
            dc_diff = zz[0] - pred[ci]
            pred[ci] = zz[0]
            s = abs(dc_diff).bit_length()
            ln, code = _DC_ENC[s]
            bw.put(code, ln)
            if s:
                v = dc_diff if dc_diff >= 0 else dc_diff + (1 << s) - 1
                bw.put(v, s)
    bw.flush()
    out += bw.out
    # scans 2-4: per-component AC band 1..63 (no DC code in an AC scan;
    # plain EOB == an EOB run of exactly 1)
    def put_ac_band(bw, zz):
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k]:
                last_nz = k
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = _AC_ENC[0xF0]
                bw.put(code, ln)
                run -= 16
            s = abs(zz[k]).bit_length()
            ln, code = _AC_ENC[(run << 4) | s]
            bw.put(code, ln)
            v = zz[k] if zz[k] >= 0 else zz[k] + (1 << s) - 1
            bw.put(v, s)
            run = 0
        if last_nz < 63:
            ln, code = _AC_ENC[0x00]
            bw.put(code, ln)

    for ci in range(3):
        out += sos([ci + 1], 1, 63)
        bw = _BitWriter()
        for by in range(2):
            for bx in range(2):
                put_ac_band(bw, zz_all[ci][by][bx])
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"

    got = decode_jpeg_pixels(bytes(out))
    assert got is not None and got.shape == (16, 16, 3)
    want = ycbcr_to_rgb(
        expected[0].astype(np.float64),
        expected[1].astype(np.float64),
        expected[2].astype(np.float64),
    )
    assert np.array_equal(got, want)


def test_image_pixel_features_scores_jpeg():
    from signalk_parquet_spark.operators.multimodal import image_pixel_features

    img = _test_image(16, 16, seed=2)
    payload, _ = encode_jpeg([img], 16, 16, [(1, 1)], [_QLUMA])
    feats = image_pixel_features(payload)
    w, h, c, mean, std, lo, hi = feats
    assert (w, h, c) == (16.0, 16.0, 1.0)
    assert not np.isnan(mean) and 0.0 <= lo <= mean <= hi <= 255.0


def test_decode_real_jpegs_vs_java_imageio(spark):
    """Cross-validate against an INDEPENDENT industrial decoder: Spark's
    image data source (Java ImageIO) on the real camera JPEGs shipped with
    the Spark distribution (real libjpeg Huffman tables, subsampling, APPn
    markers — nothing our test-side encoder produced). Different IDCT and
    chroma-upsampling implementations legitimately differ (libjpeg's
    default "fancy" bilinear chroma vs our spec-plain replication —
    chroma-detailed images land near mean 1.8), so the bound is
    mean |diff| < 2.5 and p99 <= 12 per image, with at least two images
    agreeing tightly (mean < 0.2) to prove the pipeline isn't merely
    "close". Shapes must match exactly. The set includes a real
    progressive file (grayscale.jpg, SOF2 with refinement scans — agrees
    at mean 0.018 / max 1). Skips if the sample images aren't present."""
    import glob
    import os

    root = os.environ.get("SPARK_HOME", "/opt/spark-4.1.2-bin-hadoop3")
    paths = sorted(glob.glob(f"{root}/data/mllib/images/origin/**/*.jpg", recursive=True))
    if not paths:
        pytest.skip("no Spark sample images available")
    rows = (
        spark.read.format("image").load(paths).select("image.*").collect()
    )
    compared = 0
    tight = 0
    for r in rows:
        raw = open(r["origin"].replace("file:", ""), "rb").read()
        mine = decode_jpeg_pixels(raw)
        if r["nChannels"] not in (1, 3):
            assert mine is None or mine.shape[2] in (1, 3)
            continue
        if mine is None:
            continue  # progressive or otherwise out of baseline scope
        ref = np.frombuffer(bytes(r["data"]), dtype=np.uint8).reshape(
            r["height"], r["width"], r["nChannels"]
        )
        ref = ref[:, :, ::-1] if r["nChannels"] == 3 else ref  # BGR -> RGB
        assert mine.shape == ref.shape, r["origin"]
        d = np.abs(mine.astype(int) - ref.astype(int))
        assert d.mean() < 2.5 and np.percentile(d, 99) <= 12, (
            r["origin"], d.mean(), d.max())
        compared += 1
        tight += d.mean() < 0.2
    assert compared >= 2 and tight >= 2  # real files, real agreement


# --- T.81 Annex K default tables (the MJPEG no-DHT convention) -----------------


def _codes_by_symbol(key):
    from signalk_parquet_spark.operators.jpeg import ANNEX_K_HUFF

    counts, symbols = ANNEX_K_HUFF[key]
    return {sym: (ln, code) for (ln, code), sym in
            _build_huffman(counts, symbols).items()}


def test_annex_k_canonical_spot_values():
    """Pin the embedded Annex K table data against code values the spec
    itself publishes (T.81 Tables K.3-K.6 list every code string): luma AC
    EOB=1010/4 and ZRL=11111111001/11, chroma AC EOB=00/2, the DC category
    ladders, and the run0 size1/size2 AC codes."""
    from signalk_parquet_spark.operators.jpeg import ANNEX_K_HUFF

    for key, (counts, symbols) in ANNEX_K_HUFF.items():
        assert sum(counts) == len(symbols) == (12 if key[0] == 0 else 162)
        assert len(set(symbols)) == len(symbols)
    dc_l = _codes_by_symbol((0, 0))
    assert dc_l[0] == (2, 0b00) and dc_l[1] == (3, 0b010)
    assert dc_l[6] == (4, 0b1110) and dc_l[11] == (9, 0b111111110)
    dc_c = _codes_by_symbol((0, 1))
    assert dc_c[0] == (2, 0b00) and dc_c[1] == (2, 0b01) and dc_c[2] == (2, 0b10)
    assert dc_c[3] == (3, 0b110)
    ac_l = _codes_by_symbol((1, 0))
    assert ac_l[0x00] == (4, 0b1010)  # EOB
    assert ac_l[0xF0] == (11, 0b11111111001)  # ZRL
    assert ac_l[0x01] == (2, 0b00) and ac_l[0x02] == (2, 0b01)
    ac_c = _codes_by_symbol((1, 1))
    assert ac_c[0x00] == (2, 0b00)  # EOB
    assert ac_c[0x01] == (2, 0b01)
    assert ac_c[0xF0] == (10, 0b1111111010)  # ZRL


def test_real_camera_files_use_annex_k_tables():
    """Independent real-world pin: libjpeg-lineage encoders write the
    Annex K tables verbatim unless Huffman optimization was requested, so
    the Spark-distribution camera JPEGs should carry DHT segments equal to
    the embedded defaults. Skips if no sample file has standard tables."""
    import glob
    import os

    from signalk_parquet_spark.operators.jpeg import ANNEX_K_HUFF

    root = os.environ.get("SPARK_HOME", "/opt/spark-4.1.2-bin-hadoop3")
    paths = sorted(glob.glob(f"{root}/data/mllib/images/origin/**/*.jpg", recursive=True))
    if not paths:
        pytest.skip("no Spark sample images available")
    matched = set()
    for path in paths:
        p = open(path, "rb").read()
        i = 2
        while i + 4 < len(p):
            if p[i] != 0xFF:
                break
            m = p[i + 1]
            if m in (0xD9, 0xDA):
                break
            (seglen,) = struct.unpack(">H", p[i + 2 : i + 4])
            if m == 0xC4:
                body = p[i + 4 : i + 2 + seglen]
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    counts = list(body[j + 1 : j + 17])
                    nsym = sum(counts)
                    symbols = list(body[j + 17 : j + 17 + nsym])
                    if ANNEX_K_HUFF.get((tc, th)) == (counts, symbols):
                        matched.add((tc, th))
                    j += 17 + nsym
            i += 2 + seglen
    if not matched:
        pytest.skip("no sample file carries the standard tables")
    assert matched == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_no_dht_mjpeg_fallback_exact():
    """An MJPEG-style frame with NO DHT segments decodes identically to its
    tables-included twin: encode 4:2:0 color with the Annex K tables
    (luma on DC0/AC0, chroma on DC1/AC1, the MJPEG component convention),
    strip nothing vs omit every DHT, and require exact equality with the
    encoder's decoder-arithmetic reconstruction."""
    from signalk_parquet_spark.operators.jpeg import ANNEX_K_HUFF

    rng = np.random.RandomState(23)
    h = w = 16
    y = _test_image(h, w, seed=23)
    cb = np.clip(128.0 + rng.randint(-60, 60, size=(8, 8)), 0, 255).astype(np.float64)
    cr = np.clip(128.0 + rng.randint(-60, 60, size=(8, 8)), 0, 255).astype(np.float64)
    kwargs = dict(
        dht_specs=dict(ANNEX_K_HUFF),
        table_ids=[(0, 0), (1, 1), (1, 1)],
    )
    with_tables, exp = encode_jpeg(
        [y, cb, cr], h, w, [(2, 2), (1, 1), (1, 1)], [_QLUMA, _QCHROMA], **kwargs
    )
    without, exp2 = encode_jpeg(
        [y, cb, cr], h, w, [(2, 2), (1, 1), (1, 1)], [_QLUMA, _QCHROMA],
        emit_dht=False, **kwargs
    )
    assert b"\xff\xc4" in with_tables and b"\xff\xc4" not in without
    assert len(without) < len(with_tables)
    got_t = decode_jpeg_pixels(with_tables)
    got_n = decode_jpeg_pixels(without)
    assert got_t is not None and got_n is not None
    assert np.array_equal(got_t, got_n)
    up = lambda p: np.kron(p, np.ones((2, 2)))  # replicate chroma to full res
    want = ycbcr_to_rgb(
        exp[0][:h, :w].astype(np.float64),
        up(exp[1].astype(np.float64))[:h, :w],
        up(exp[2].astype(np.float64))[:h, :w],
    )
    assert np.array_equal(got_n, want)


def test_partial_dht_corruption_still_quarantines():
    """The Annex K backfill applies ONLY to frames that define no DHT at
    all (the MJPEG convention). A file that DID define tables but lost
    one must keep returning None (quarantine), never silently decode its
    entropy data under substituted tables."""
    from signalk_parquet_spark.operators.jpeg import ANNEX_K_HUFF

    rng = np.random.RandomState(31)
    y = _test_image(16, 16, seed=31)
    cb = np.clip(128.0 + rng.randint(-60, 60, size=(16, 16)), 0, 255).astype(np.float64)
    cr = np.clip(128.0 + rng.randint(-60, 60, size=(16, 16)), 0, 255).astype(np.float64)
    payload, _ = encode_jpeg(
        [y, cb, cr], 16, 16, [(1, 1)] * 3, [_QLUMA, _QCHROMA],
        dht_specs=dict(ANNEX_K_HUFF), table_ids=[(0, 0), (1, 1), (1, 1)],
    )
    assert decode_jpeg_pixels(payload) is not None
    # strip exactly ONE DHT segment (the chroma AC table the scan needs)
    i = 2
    stripped = None
    while i + 4 < len(payload):
        seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if payload[i + 1] == 0xC4 and (payload[i + 4] >> 4, payload[i + 4] & 0x0F) == (1, 1):
            stripped = payload[:i] + payload[i + 2 + seglen :]
            break
        i += 2 + seglen
    assert stripped is not None and stripped != payload
    assert decode_jpeg_pixels(stripped) is None  # quarantined, not backfilled


def test_randomized_roundtrip_fuzz_exact():
    """Seeded randomized sweep over the encoder's parameter space —
    sizes (including non-MCU-aligned), samplings (4:4:4/4:2:2/4:2:0 and
    asymmetric), restart intervals, quant tables, Annex K vs uniform
    Huffman, DHT omission — every combination must round-trip EXACTLY to
    the encoder's decoder-arithmetic reconstruction."""
    from signalk_parquet_spark.operators.jpeg import ANNEX_K_HUFF

    rng = np.random.RandomState(2024)
    samplings = [
        [(1, 1)], [(2, 2), (1, 1), (1, 1)], [(2, 1), (1, 1), (1, 1)],
        [(1, 2), (1, 1), (1, 1)], [(1, 1), (1, 1), (1, 1)],
        [(4, 1), (1, 1), (1, 1)],
    ]
    for trial in range(12):
        h = int(rng.randint(8, 40))
        w = int(rng.randint(8, 40))
        sampling = samplings[trial % len(samplings)]
        ncomp = len(sampling)
        hmax = max(s[0] for s in sampling)
        vmax = max(s[1] for s in sampling)
        planes = []
        for ci in range(ncomp):
            ch, cv = sampling[ci]
            sh = -(-h * cv // vmax)
            sw = -(-w * ch // hmax)
            planes.append(rng.randint(0, 256, size=(sh, sw)).astype(np.float64))
        qv = int(rng.choice([8, 16, 24, 40]))
        qtabs = [[qv] * 64, [qv + 8] * 64][: min(ncomp, 2)]
        if ncomp == 1:
            qtabs = [qtabs[0]]
        restart = int(rng.choice([0, 1, 3]))
        use_k = trial % 3 == 0
        kwargs = {}
        if use_k:
            kwargs = dict(
                dht_specs=dict(ANNEX_K_HUFF),
                table_ids=[(0, 0)] + [(1, 1)] * (ncomp - 1),
                emit_dht=trial % 6 != 0,  # every other K trial omits DHT
            )
        payload, expected = encode_jpeg(
            planes, h, w, sampling, qtabs, restart_interval=restart, **kwargs
        )
        got = decode_jpeg_pixels(payload)
        assert got is not None, (trial, h, w, sampling, restart)
        assert got.shape[:2] == (h, w)
        # compare in component space: upsample expected planes like the decoder
        if ncomp == 1:
            assert np.array_equal(got[:, :, 0], expected[0][:h, :w]), (trial, h, w)
        else:
            ups = []
            for ci in range(ncomp):
                ch, cv = sampling[ci]
                e = expected[ci].astype(np.float64)
                e = np.repeat(np.repeat(e, vmax // cv, axis=0), hmax // ch, axis=1)
                ups.append(e[:h, :w])
            want = ycbcr_to_rgb(*ups)
            assert np.array_equal(got, want), (trial, h, w, sampling, restart)
