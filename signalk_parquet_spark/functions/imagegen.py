"""Deterministic synthetic image payload generation for the media keep/drop
gate (and any planted-dup evaluation): one pseudorandom grayscale picture per
CONTENT GROUP, encoded per-item as either 24-bit BMP or 8-bit grayscale PNG.

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
