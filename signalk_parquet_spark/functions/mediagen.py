"""Deterministic synthetic media payload generation for the keep/drop gates
(and any planted-dup evaluation), one corpus per modality: images (one
pseudorandom picture per CONTENT GROUP, encoded per-item as 24-bit BMP or
8-bit grayscale PNG), audio (PCM WAV, mono vs stereo-L=R variants), and
video (animated GIF, identity vs permuted-palette variants).

Why this exists: a DuckDB oracle cannot dHash image bytes, but it CAN know
the planted truth — items share pixels iff they share ``doc_id // group``,
so the expected keep/drop decisions are pure SQL over doc_id while the Spark
side must really decode (two different codecs), hash, band-join, and close
the pair relation transitively to reproduce them. Lossless decode is what
makes the plant exact: the same pixels through BMP and PNG hash IDENTICALLY
(operators/multimodal.image_dhash), so within-group pairs sit at Hamming 0
by construction, and pseudorandom content makes cross-group dHashes
effectively uniform 64-bit values (collision within the Hamming-3 verify
radius over ~10^3 groups: ~1e-9).

Encoders follow the public specs (PNG: RFC 2083; BMP: BITMAPINFOHEADER
layout) — minimal, filter-0 / BI_RGB only — and round-trip against the
repo's own decoders in tests/test_media_decisions.py. Reference analogue:
the reference has no media pipeline at all; this supports the LLM-pipeline
extension surface (SURVEY §2 extension: multimodal near-dup end products).
"""

from __future__ import annotations

import struct
import zlib


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    raw = tag + body
    return struct.pack(">I", len(body)) + raw + struct.pack(">I", zlib.crc32(raw))


def encode_png_gray(arr) -> bytes:
    """8-bit grayscale PNG (color type 0, filter 0 scanlines)."""
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    scanlines = b"".join(b"\x00" + bytes(arr[r].tobytes()) for r in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )


def encode_bmp_gray_as_rgb24(arr) -> bytes:
    """24-bit BI_RGB BMP of a grayscale array (B=G=R=value): bottom-up rows,
    4-byte row padding per the spec."""
    h, w = arr.shape
    row_pad = (-(w * 3)) % 4
    body = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = arr[r]
        for v in row.tolist():
            body += bytes((v, v, v))  # BGR (equal channels)
        body += b"\x00" * row_pad
    pixel_off = 14 + 40
    file_hdr = struct.pack("<2sIHHI", b"BM", pixel_off + len(body), 0, 0, pixel_off)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return file_hdr + info_hdr + bytes(body)


def group_pixels(group: int, size: int = 16):
    """The content of one group: PCG64-seeded uint8 noise — deterministic
    across platforms/runs for a given group id, and uniform enough that
    distinct groups' dHashes behave like independent 64-bit draws."""
    import numpy as np

    return np.random.default_rng(group).integers(0, 256, (size, size), dtype=np.uint8)


def payload_for(doc_id: int, group_size: int = 4) -> bytes:
    """The gate's planted corpus: items with the same doc_id // group_size
    share pixels; even ids ship as BMP, odd ids as grayscale PNG — so every
    within-group pair also crosses codecs somewhere, making the gate verify
    cross-format decode parity, not just hash plumbing."""
    px = group_pixels(doc_id // group_size)
    return encode_bmp_gray_as_rgb24(px) if doc_id % 2 == 0 else encode_png_gray(px)


# --- audio (PCM WAV) ------------------------------------------------------------


def encode_wav_pcm16(samples, rate: int = 8000, channels: int = 1) -> bytes:
    """16-bit PCM WAV via stdlib wave; channels > 1 duplicates the mono
    signal into every channel (L = R = ...)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        mono = samples.astype(np.int16)
        frames = np.repeat(mono, channels) if channels > 1 else mono
        w.writeframes(frames.tobytes())
    return buf.getvalue()


def group_samples(group: int, n: int = 4096):
    """One group's audio content: seeded int16 noise (full-scale /4 so the
    stereo mean stays exactly representable and clipping is impossible)."""
    import numpy as np

    return np.random.default_rng(10_000_019 + group).integers(
        -8192, 8192, n, dtype=np.int16
    )


def audio_payload_for(doc_id: int, group_size: int = 4) -> bytes:
    """Planted audio corpus: same doc_id // group_size → same samples; even
    ids mono, odd ids stereo with L = R. decode_wav_samples averages the
    channels, and the mean of two identical values is the SAME float64 —
    so within-group fingerprints are bit-identical (BER 0) while the gate
    genuinely exercises the channel-mixing decode path."""
    x = group_samples(doc_id // group_size)
    return encode_wav_pcm16(x, channels=1 if doc_id % 2 == 0 else 2)


# --- video (animated GIF) -------------------------------------------------------


def _lzw_literals(min_code: int, indices) -> bytes:
    """GIF LZW stream of pure literal codes with clear-code resets before
    the fixed width would overflow — valid per the spec, no string table
    needed on the encode side."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    code_size = min_code + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int) -> None:
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
        if dict_size == (1 << code_size) - 1:
            put(clear)
            dict_size = end + 1
    put(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        out.append(len(data[i : i + 255]))
        out += data[i : i + 255]
    out.append(0)
    return bytes(out)


def encode_gif_frames(frames, palette) -> bytes:
    """Animated GIF89a: one global 256-color palette, every frame a
    full-canvas image block (disposal 0 — draw over), 8-bit LZW literal
    streams. ``frames`` is a list of (H, W) uint8 index arrays."""
    import struct

    import numpy as np

    h, w = frames[0].shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 7, 0, 0)  # 256-entry GCT
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    for fr in frames:
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(8)  # min LZW code size for 256-entry palette
        out += _sub_blocks(_lzw_literals(8, fr.flatten()))
    out += bytes([0x3B])
    return bytes(out)


_N_FRAMES = 4


def video_payload_for(doc_id: int, group_size: int = 4) -> bytes:
    """Planted video corpus: same doc_id // group_size → same RGB frames.
    Even ids use the identity gray palette; odd ids PERMUTE both the
    palette and the index planes with a doc-seeded permutation, so the
    decoded RGB (and hence every frame dHash) is identical while the
    bytes — palette and LZW stream alike — differ per item: the gate
    verifies real palette mapping, not byte dedup."""
    import numpy as np

    group = doc_id // group_size
    rng = np.random.default_rng(20_000_003 + group)
    frames = [
        rng.integers(0, 256, (16, 16), dtype=np.uint8) for _ in range(_N_FRAMES)
    ]
    gray = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)
    if doc_id % 2 == 0:
        return encode_gif_frames(frames, gray)
    perm = np.random.default_rng(doc_id).permutation(256).astype(np.uint8)
    inv = np.empty(256, dtype=np.uint8)
    inv[perm] = np.arange(256, dtype=np.uint8)
    # new_index = perm[old_index]; new_palette[j] = gray[inv[j]]
    # ⇒ new_palette[new_index[x]] = gray[old_index[x]] — same RGB everywhere
    return encode_gif_frames([perm[f] for f in frames], gray[inv])


# --- video (MJPEG-in-AVI) ---------------------------------------------------------

_MJPEG_W, _MJPEG_H = 32, 24  # 4 x 3 JPEG blocks
_MJPEG_FRAMES = 4
_MJPEG_BLOCKS = (_MJPEG_W // 8) * (_MJPEG_H // 8)


def mjpeg_block_value(group: int, frame: int, blk: int) -> int:
    """Planted per-block gray value — SQL-expressible ON PURPOSE: the
    mjpeg_frame_features oracle recomputes it as
    ``((doc_id // group)*73 + frame*31 + blk*17) % 251 + 2`` over
    range() tables, so frame luma sums/min/max have analytic truth."""
    return (group * 73 + frame * 31 + blk * 17) % 251 + 2


class _JpegBitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc = (self.acc << (8 - self.nbits)) | ((1 << (8 - self.nbits)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


_MJPEG_ENC_TABLES: dict = {}


def _annex_k_enc(key):
    """Encoder-side Annex K table {symbol: (length, code)} (the decoder
    module publishes the spec tables; we invert its canonical build)."""
    if key not in _MJPEG_ENC_TABLES:
        from ..operators.jpeg import ANNEX_K_HUFF, _build_huffman

        _MJPEG_ENC_TABLES[key] = {
            sym: (ln, code)
            for (ln, code), sym in _build_huffman(*ANNEX_K_HUFF[key]).items()
        }
    return _MJPEG_ENC_TABLES[key]


def encode_jpeg_gray_dconly(block_vals, blocks_w: int, blocks_h: int) -> bytes:
    """Minimal baseline grayscale JPEG for PIECEWISE-CONSTANT 8x8 blocks
    with an ALL-ONES quant table. A constant block's FDCT is DC-only with
    DC = 8*(value-128) — an exact integer — and every AC exactly 0, so the
    scan is just DC-diff + EOB per block and the decode round-trip is
    EXACT (DC-only IDCT = DC/8 + 128 = value, dyadic at every step). No
    DHT segments: the MJPEG no-tables convention — the decoder backfills
    the T.81 Annex K defaults (operators/jpeg.py ANNEX_K_HUFF), which is
    exactly the convention this generator must exercise."""
    import struct as _s

    dc_enc, ac_enc = _annex_k_enc((0, 0)), _annex_k_enc((1, 0))
    h, w = blocks_h * 8, blocks_w * 8
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + _s.pack(">H", 2 + 1 + 64) + bytes([0]) + bytes([1] * 64)
    sof = bytes([8]) + _s.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc0" + _s.pack(">H", len(sof) + 2) + sof
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + _s.pack(">H", len(sos) + 2) + sos
    bw = _JpegBitWriter()
    pred = 0
    for v in block_vals:
        dc = 8 * (int(v) - 128)
        diff = dc - pred
        s = abs(diff).bit_length()
        ln, code = dc_enc[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        ln, code = ac_enc[0x00]  # EOB — every AC is exactly zero
        bw.put(code, ln)
        pred = dc
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_avi_mjpeg(jpeg_frames: list[bytes], w: int, h: int, fps: int = 10) -> bytes:
    """Minimal AVI-RIFF mux of standalone JPEG frames as one MJPG video
    stream ('00dc' chunks, word-aligned), per the public Microsoft RIFF/AVI
    layout: LIST hdrl (avih + LIST strl (strh 'vids'/'MJPG' + strf
    BITMAPINFOHEADER with biCompression='MJPG')) + LIST movi."""
    import struct as _s

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + _s.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    n = len(jpeg_frames)
    avih = _s.pack(
        "<10I", 1_000_000 // fps, 0, 0, 0x10, n, 0, 1, 0, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + _s.pack("<IHHIIIII", 0, 0, 0, 0, 1, fps, 0, n)
        + _s.pack("<IiI", 0, -1, 0) + _s.pack("<4H", 0, 0, w, h)
    )
    strf = _s.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + _s.pack("<I", len(riff_body)) + riff_body


def mjpeg_payload_for(doc_id: int, group_size: int = 4) -> bytes:
    """Planted MJPEG corpus: _MJPEG_FRAMES piecewise-constant frames whose
    8x8-block values are the SQL-expressible plant (mjpeg_block_value of
    doc_id // group_size) — the features gate's analytic truth."""
    g = doc_id // group_size
    frames = [
        encode_jpeg_gray_dconly(
            [mjpeg_block_value(g, f, b) for b in range(_MJPEG_BLOCKS)],
            _MJPEG_W // 8,
            _MJPEG_H // 8,
        )
        for f in range(_MJPEG_FRAMES)
    ]
    return encode_avi_mjpeg(frames, _MJPEG_W, _MJPEG_H)
