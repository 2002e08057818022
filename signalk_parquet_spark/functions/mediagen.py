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
