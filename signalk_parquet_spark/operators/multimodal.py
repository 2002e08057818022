"""Multimodal columns — image/audio/video as opaque binary columns with
typed metadata, processed batch-wise via mapInPandas (BASELINE extension).

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. DECODE is real for all three modalities:
pure-Python header parsers for PNG/JPEG/GIF/BMP images, a stdlib-`wave`
WAV parser, and an ISO-BMFF box walker for MP4 video (moov/mvhd duration,
tkhd dimensions) are registered into DECODERS at import. PIL backstops
image formats the header parser can't read (import-gated). PIXEL access
is real for 8-bit PNG (stdlib zlib + numpy unfiltering —
decode_png_pixels), JPEG — baseline AND progressive (operators/jpeg.py:
full T.81 marker/Huffman/zigzag/IDCT path incl. Annex G successive
approximation, exact-round-trip tested and cross-validated against Java
ImageIO), GIF (operators/raster.py: full LZW, interlace, transparency —
bit-identical to ImageIO on real files), and BMP (BI_RGB 8/24/32) — all
under DECODERS["image_pixels"] via image_pixel_features, covering every
format sniff_format knows; video FRAME decode still needs a codec
library — plug it in the same way.

Scale design: media rows are large, so operators here
  - never collect() or explode binaries;
  - process per Arrow batch (mapInPandas) so memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch;
  - keep metadata in plain columns so filters (modality, size, dims) prune
    BEFORE any decode touches bytes.
"""

from __future__ import annotations

import hashlib
import io
import struct
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("meta_json", T.StringType()),
    ]
)

#: pluggable decoders: modality -> bytes -> feature vector (list[float])
DECODERS: dict[str, Callable[[bytes], list[float]]] = {}


def deterministic_stub_decoder(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'feature extraction' used when no real decoder is
    registered: md5-seeded values in [0,1). Keeps the full pipeline testable
    without media libraries."""
    h = hashlib.md5(payload).digest()
    return [h[i % 16] / 255.0 for i in range(dim)]


# --- real header decoders (pure Python — no media libraries required) -----------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Container format from magic bytes (image/audio formats we decode)."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if payload.startswith(b"BM"):
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    return None


def parse_image_header(payload: bytes) -> dict | None:
    """Real image decode of the header fields: (format, width, height,
    bit depth / bits-per-pixel, channel count). Covers PNG (IHDR), JPEG
    (SOFn marker walk), GIF (logical screen descriptor), BMP (BITMAPINFOHEADER).
    Returns None for anything it cannot parse."""
    fmt = sniff_format(payload)
    try:
        if fmt == "png":
            # 8-byte signature, then IHDR: len(4) 'IHDR'(4) w(4) h(4) depth(1) color(1)
            if payload[12:16] != b"IHDR":
                return None
            w, h = struct.unpack(">II", payload[16:24])
            depth, color_type = payload[24], payload[25]
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
            return {"format": fmt, "width": w, "height": h, "bit_depth": depth, "channels": channels}
        if fmt == "jpeg":
            # walk the marker stream to the first SOFn frame header
            i = 2
            n = len(payload)
            while i + 9 < n:
                if payload[i] != 0xFF:
                    i += 1
                    continue
                marker = payload[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no length
                    i += 2
                    continue
                seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    precision = payload[i + 4]
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    ncomp = payload[i + 9]
                    return {"format": fmt, "width": w, "height": h, "bit_depth": precision, "channels": ncomp}
                i += 2 + seg_len
            return None
        if fmt == "gif":
            w, h = struct.unpack("<HH", payload[6:10])
            return {"format": fmt, "width": w, "height": h, "bit_depth": 8, "channels": 3}
        if fmt == "bmp":
            w, h = struct.unpack("<ii", payload[18:26])
            bpp = struct.unpack("<H", payload[28:30])[0]
            return {"format": fmt, "width": w, "height": abs(h), "bit_depth": bpp, "channels": max(1, bpp // 8)}
    except (struct.error, IndexError):
        return None
    return None


def parse_wav_header(payload: bytes) -> dict | None:
    """Real audio decode of WAV params via the stdlib `wave` reader:
    channels, sample rate, sample width, frame count, duration."""
    import wave

    if sniff_format(payload) != "wav":
        return None
    try:
        with wave.open(io.BytesIO(payload)) as w:
            n_frames = w.getnframes()
            rate = w.getframerate()
            return {
                "format": "wav",
                "channels": w.getnchannels(),
                "sample_rate": rate,
                "sample_width_bytes": w.getsampwidth(),
                "n_frames": n_frames,
                "duration_s": (n_frames / rate) if rate else None,
            }
    except (wave.Error, EOFError, struct.error):
        return None


def _iter_boxes(buf: bytes, start: int, end: int):
    """Walk ISO BMFF (MP4) boxes in buf[start:end] → (type, body_start, box_end)."""
    i = start
    while i + 8 <= end:
        size, btype = struct.unpack(">I4s", buf[i : i + 8])
        header = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                return
            size = struct.unpack(">Q", buf[i + 8 : i + 16])[0]
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - i
        if size < header or i + size > end:
            return
        yield btype, i + header, i + size
        i += size


def parse_video_header(payload: bytes) -> dict | None:
    """Real video container decode for MP4/ISO-BMFF: walks the box tree to
    `moov/mvhd` (timescale + duration → seconds) and `moov/trak/tkhd`
    (16.16 fixed-point presentation width/height, track count). Pure-Python
    box parsing — the frame/codec payload is untouched, matching the
    PNG/WAV header-decoder approach (no codec library in this container).
    Returns None for anything that isn't parseable MP4 or AVI (AVI rides
    operators/video.parse_avi_header, mapped onto the same keys with
    n_tracks = the AVI stream count)."""
    if sniff_format(payload) == "avi":
        from .video import parse_avi_header

        meta = parse_avi_header(payload)
        if meta is None:
            return None
        return {
            "format": "avi",
            "width": meta["width"],
            "height": meta["height"],
            "duration_s": meta["duration_s"],
            "n_tracks": meta["n_streams"],
        }
    if sniff_format(payload) != "mp4":
        return None
    try:
        out: dict = {"format": "mp4", "width": None, "height": None,
                     "duration_s": None, "n_tracks": 0}
        for btype, body, boxend in _iter_boxes(payload, 0, len(payload)):
            if btype != b"moov":
                continue
            for ctype, cbody, cend in _iter_boxes(payload, body, boxend):
                if ctype == b"mvhd":
                    version = payload[cbody]
                    if version == 1:
                        timescale, duration = struct.unpack(
                            ">IQ", payload[cbody + 20 : cbody + 32]
                        )
                    else:
                        timescale, duration = struct.unpack(
                            ">II", payload[cbody + 12 : cbody + 20]
                        )
                    if timescale:
                        out["duration_s"] = duration / timescale
                elif ctype == b"trak":
                    out["n_tracks"] += 1
                    for ttype, tbody, _tend in _iter_boxes(payload, cbody, cend):
                        if ttype != b"tkhd":
                            continue
                        version = payload[tbody]
                        # width/height are the LAST 8 bytes of tkhd, 16.16 fixed
                        w_fp, h_fp = struct.unpack(">II", payload[_tend - 8 : _tend])
                        w, h = w_fp >> 16, h_fp >> 16
                        if w and h:  # audio tracks carry 0x0
                            out["width"], out["height"] = w, h
            return out if out["n_tracks"] else None
        return None
    except (struct.error, IndexError):
        return None


def _image_features_from_header(meta: dict | None) -> list[float] | None:
    if meta is None:
        return None
    return [
        float(meta["width"]),
        float(meta["height"]),
        float(meta["bit_depth"]),
        float(meta["channels"] if meta["channels"] is not None else float("nan")),
    ]


def image_header_features(payload: bytes) -> list[float]:
    """DECODERS entry for modality='image': decoded (width, height,
    bit_depth, channels) as the feature vector; NaNs when undecodable so
    downstream filters can quarantine bad payloads instead of crashing."""
    feats = _image_features_from_header(parse_image_header(payload))
    return feats if feats is not None else [float("nan")] * 4


def audio_header_features(payload: bytes) -> list[float]:
    """DECODERS entry for modality='audio': decoded (channels, sample_rate,
    sample_width_bytes, duration_s)."""
    meta = parse_wav_header(payload)
    if meta is None:
        return [float("nan")] * 4
    return [
        float(meta["channels"]),
        float(meta["sample_rate"]),
        float(meta["sample_width_bytes"]),
        float(meta["duration_s"] if meta["duration_s"] is not None else float("nan")),
    ]


def video_header_features(payload: bytes) -> list[float]:
    """DECODERS entry for modality='video': decoded (width, height,
    duration_s, n_tracks) from the MP4 moov atom."""
    meta = parse_video_header(payload)
    if meta is None:
        return [float("nan")] * 4
    return [
        float(meta["width"]) if meta["width"] else float("nan"),
        float(meta["height"]) if meta["height"] else float("nan"),
        float(meta["duration_s"]) if meta["duration_s"] is not None else float("nan"),
        float(meta["n_tracks"]),
    ]


def decode_png_pixels(payload: bytes):
    """REAL pixel decode for 8-bit non-interlaced PNG (gray, gray+alpha,
    RGB, RGBA, palette) using only stdlib zlib + numpy: concatenate IDAT,
    inflate, undo the per-scanline filters (None/Sub/Up/Average/Paeth per
    the PNG spec), apply PLTE for palette images. Returns an (H, W, C)
    uint8 array, or None for anything out of scope (16-bit, interlaced,
    truncated) — callers quarantine rather than crash.

    Scale note: Sub/Average/Paeth unfiltering is sequential per pixel, so
    this pure-Python path is for modest thumbnails/previews; a codec
    library slots into DECODERS for production-size images. Up/None rows
    vectorize with numpy."""
    import zlib

    import numpy as np

    if sniff_format(payload) != "png" or payload[12:16] != b"IHDR":
        return None
    try:
        w, h = struct.unpack(">II", payload[16:24])
        depth, color_type, _comp, _filt, interlace = payload[24:29]
        if depth != 8 or interlace != 0:
            return None
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
        if channels is None or w == 0 or h == 0:
            return None
        # walk chunks for PLTE + IDAT
        idat, plte = b"", None
        i = 8
        while i + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[i : i + 4])
            tag = payload[i + 4 : i + 8]
            body = payload[i + 8 : i + 8 + length]
            if tag == b"IDAT":
                idat += body
            elif tag == b"PLTE":
                plte = body
            elif tag == b"IEND":
                break
            i += 12 + length
        raw = zlib.decompress(idat)
        stride = w * channels
        if len(raw) != h * (stride + 1):
            return None
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        bpp = channels
        for row in range(h):
            f = raw[row * (stride + 1)]
            line = np.frombuffer(
                raw, dtype=np.uint8, count=stride, offset=row * (stride + 1) + 1
            ).copy()
            if f == 0:
                pass
            elif f == 2:  # Up — vectorizes
                line += prev
            elif f in (1, 3, 4):  # Sub/Average/Paeth — sequential in x
                cur = line.astype(np.int32)
                pv = prev.astype(np.int32)
                for x in range(stride):
                    a = cur[x - bpp] if x >= bpp else 0
                    if f == 1:
                        cur[x] = (cur[x] + a) & 0xFF
                    elif f == 3:
                        cur[x] = (cur[x] + (a + pv[x]) // 2) & 0xFF
                    else:  # Paeth
                        b = pv[x]
                        c = pv[x - bpp] if x >= bpp else 0
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                        cur[x] = (cur[x] + pred) & 0xFF
                line = cur.astype(np.uint8)
            else:
                return None
            out[row] = line
            prev = line
        px = out.reshape(h, w, channels)
        if color_type == 3:  # palette lookup -> RGB
            if plte is None:
                return None
            pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            px = pal[px[:, :, 0]]
        return px
    except (struct.error, IndexError, zlib.error, ValueError):
        return None


def decode_image_pixels(payload: bytes):
    """Unified still-image pixel decode: dispatch on sniffed format to the
    pure-Python decoders (8-bit PNG, baseline/progressive JPEG, GIF, BMP)
    → (H, W, C) uint8 array, or None outside coverage."""
    px = decode_png_pixels(payload)
    if px is None:
        fmt = sniff_format(payload)
        if fmt == "jpeg":
            from .jpeg import decode_jpeg_pixels

            px = decode_jpeg_pixels(payload)
        elif fmt == "gif":
            from .raster import decode_gif_pixels

            px = decode_gif_pixels(payload)
        elif fmt == "bmp":
            from .raster import decode_bmp_pixels

            px = decode_bmp_pixels(payload)
    return px


def image_pixel_features(payload: bytes) -> list[float]:
    """DECODERS-style entry scoring actual PIXELS, not header fields:
    (width, height, channels, mean, std, min, max) of the luma plane
    (ITU-R BT.601 weights for color images). Dispatches on format: 8-bit
    PNG (decode_png_pixels) or baseline JPEG (operators.jpeg); NaNs for
    anything neither covers."""
    import numpy as np

    px = decode_image_pixels(payload)
    if px is None:
        return [float("nan")] * 7
    h, w, c = px.shape
    arr = px.astype(np.float64)
    if c >= 3:
        luma = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    else:
        luma = arr[:, :, 0]
    return [
        float(w),
        float(h),
        float(c),
        float(luma.mean()),
        float(luma.std()),
        float(luma.min()),
        float(luma.max()),
    ]


def image_dhash(payload: bytes) -> int | None:
    """64-bit difference hash (dHash) of the decoded image: integer BT.601
    luma (299R+587G+114B, exact int64 — no float rounding across
    platforms), box-resized to 8x9 via the summed-area resize, bit
    (r, c) = luma[r, c] > luma[r, c+1], packed row-major into a SIGNED
    64-bit value (Spark LongType). Because PNG/GIF/BMP decode losslessly,
    the SAME picture stored in different lossless formats hashes
    IDENTICALLY — cross-format exact dedup; a JPEG re-encode lands a few
    bits away, caught by the Hamming probe. None when undecodable."""
    px = decode_image_pixels(payload)
    if px is None:
        return None
    return dhash_pixels(px)


def _int_luma(px):
    """Exact integer BT.601 luma (x1000) of an (H, W[, C]) uint8 array —
    the shared plane under dhash_pixels and image_phash (gray weights sum
    to the same x1000 scale, so gray and RGB encodings of the same
    picture agree)."""
    import numpy as np

    arr = px.astype(np.int64)
    if arr.ndim == 3 and arr.shape[2] >= 3:
        return 299 * arr[:, :, 0] + 587 * arr[:, :, 1] + 114 * arr[:, :, 2]
    return 1000 * arr.reshape(arr.shape[0], arr.shape[1], -1)[:, :, 0]


def dhash_pixels(px) -> int:
    """dHash of an already-decoded (H, W, C) uint8 array (the shared core
    under image_dhash and video.video_frame_hashes)."""
    lum = _int_luma(px)
    small = _resize_int(lum, 8, 9)
    h = 0
    for r in range(8):
        for c in range(8):
            if small[r, c] > small[r, c + 1]:
                h |= 1 << (r * 8 + c)
    return h - (1 << 64) if h >= (1 << 63) else h


def _resize_int(plane, out_h: int, out_w: int):
    """Integer floor-mean box resize of a 2-D int64 plane (the raster
    summed-area method without the uint8 clamp — luma here is x1000)."""
    import numpy as np

    from .raster import replicate_to_min

    plane = replicate_to_min(plane, out_h, out_w)
    h, w = plane.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    sat = np.zeros((h + 1, w + 1), dtype=np.int64)
    sat[1:, 1:] = plane.cumsum(axis=0).cumsum(axis=1)
    y0, y1 = ys[:-1, None], ys[1:, None]
    x0, x1 = xs[None, :-1], xs[None, 1:]
    sums = sat[y1, x1] - sat[y0, x1] - sat[y1, x0] + sat[y0, x0]
    cnt = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    return sums // cnt


def image_phash(payload: bytes) -> int | None:
    """64-bit DCT perceptual hash (pHash): integer BT.601 luma box-resized
    to 32x32, orthonormal 2-D DCT, the low-frequency 8x8 corner
    thresholded at its own median → 64 bits. A second LENS next to
    image_dhash, not a replacement — each is fragile exactly where its
    comparisons are near ties (measured, SCALE.md): dHash breaks on
    flat-block content (adjacent-pixel ties flipped by requantization,
    re-encode Hamming 8-21) where pHash separates cleanly; pHash breaks
    on sparse-spectrum content (most DCT coefficients sit near the
    median) where dHash holds at Hamming 0-6. Production dedup runs both
    lenses and unions candidates. None when undecodable."""
    import numpy as np

    px = decode_image_pixels(payload)
    if px is None:
        return None
    small = _resize_int(_int_luma(px), 32, 32).astype(np.float64)
    m = _dct_matrix_n(32)
    coefs = (m @ small @ m.T)[:8, :8].flatten()
    med = float(np.median(coefs))
    h = 0
    for k, c in enumerate(coefs):
        if c > med:
            h |= 1 << k
    return h - (1 << 64) if h >= (1 << 63) else h


def _dct_matrix_n(n: int):
    """Orthonormal n-point DCT-II matrix (the 8-point one lives in
    operators/jpeg._dct_matrix; pHash needs 32)."""
    import math

    import numpy as np

    m = np.zeros((n, n), dtype=np.float64)
    for u in range(n):
        cu = math.sqrt(1.0 / n) if u == 0 else math.sqrt(2.0 / n)
        for x in range(n):
            m[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / (2 * n))
    return m


IMAGE_HASHERS = {"dhash": image_dhash, "phash": image_phash}


def image_hashes(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    method: str = "dhash",
) -> DataFrame:
    """(id, h) per decodable image via one Arrow map stage; undecodable
    payloads yield no row (quarantine-by-omission). ``method`` picks the
    hash lens from IMAGE_HASHERS (dhash | phash)."""
    hasher = IMAGE_HASHERS[method]
    out_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("h", T.LongType())]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                h = hasher(bytes(payload))
                if h is not None:
                    rows.append((int(mid), h))
            yield pd.DataFrame(rows, columns=["id", "h"])

    return df.select(id_col, payload_col).mapInPandas(_batches, schema=out_schema)


def image_neardup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    bands: int = 4,
    max_df: int | None = 1000,
    method: str = "dhash",
) -> DataFrame:
    """Distributed image near-dup: dHash banding — the simhash ladder
    applied to pixels. Candidates share at least one exact 16-bit band of
    the 64-bit hash (equality join, never all-pairs); the verify recomputes
    the full Hamming distance JVM-side (bit_count(xor)). By pigeonhole,
    any pair within Hamming ``bands - 1`` differs in at most bands-1 bands
    and therefore SHARES one — so with the default bands=4, recall at the
    default max_hamming=3 is EXACT, not probabilistic. Raising max_hamming
    beyond bands-1 requires more bands for the same guarantee.

    ``max_df`` drops ubiquitous (band, value) buckets before the
    self-join — blank/solid images all hash to 0 and would make the join
    quadratic in their count (the winnowing stop-fingerprint cap; flat
    content has no pair-discriminating signal anyway).

    Returns (id_a, id_b, hamming). Cross-format: the same picture stored
    as PNG and BMP (lossless decodes) meets at Hamming 0."""
    hashes = image_hashes(df, id_col, payload_col, method)
    hashes.persist().count()  # materialize before the self-join (CLAUDE.md)
    band_rows = hashes.select(
        "id",
        "h",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("band_idx"),
                    F.shiftrightunsigned("h", 16 * j).bitwiseAND(F.lit(0xFFFF)).alias("band_val"),
                )
                for j in range(bands)
            ])
        ).alias("b"),
    ).select("id", "h", "b.band_idx", "b.band_val")
    if max_df is not None:
        hot = (
            band_rows.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("band_idx", "band_val")
        )
        band_rows = band_rows.join(
            F.broadcast(hot), ["band_idx", "band_val"], "left_anti"
        )
    a, b = band_rows.alias("a"), band_rows.alias("b")
    ham = F.bit_count(F.col("a.h").bitwiseXOR(F.col("b.h")))
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(ham <= max_hamming)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
    )


def audio_sample_features(payload: bytes) -> list[float]:
    """Sample-level WAV scoring (stdlib wave + numpy, no media library):
    (channels, sample_rate, duration_s, rms, peak) over the actual PCM
    samples normalized to [-1, 1]. 16-bit and 8-bit PCM; NaNs otherwise."""
    import wave

    import numpy as np

    if sniff_format(payload) != "wav":
        return [float("nan")] * 5
    try:
        with wave.open(io.BytesIO(payload)) as w:
            n, rate, width = w.getnframes(), w.getframerate(), w.getsampwidth()
            frames = w.readframes(n)
            if width == 2:
                x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
            elif width == 1:  # 8-bit WAV is unsigned
                x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
            else:
                return [float("nan")] * 5
            if x.size == 0:
                return [float(w.getnchannels()), float(rate), 0.0, 0.0, 0.0]
            return [
                float(w.getnchannels()),
                float(rate),
                float(n) / rate,
                float(np.sqrt(np.mean(x * x))),
                float(np.max(np.abs(x))),
            ]
    except (wave.Error, EOFError, ValueError):
        return [float("nan")] * 5


def register_default_decoders() -> None:
    """Register the real image/audio/video decoders. For images the header
    parser is authoritative for (width, height, bit_depth, channels) so the
    feature vector is IDENTICAL whether or not PIL is installed (an earlier
    PIL branch hardcoded bit_depth=8 and counted bands, so a 16-bit or
    palette PNG scored differently per environment); PIL only backstops
    formats the header parser can't read."""
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image

        _MODE_DEPTH = {"1": 1, "I;16": 16, "I": 32, "F": 32}

        def _pil_features(payload: bytes) -> list[float]:
            feats = _image_features_from_header(parse_image_header(payload))
            if feats is not None:
                return feats
            with Image.open(io.BytesIO(payload)) as im:
                return [
                    float(im.width),
                    float(im.height),
                    float(_MODE_DEPTH.get(im.mode, 8)),
                    float(len(im.getbands())),
                ]

        DECODERS["image"] = _pil_features
    except ImportError:
        DECODERS["image"] = image_header_features
    DECODERS["audio"] = audio_header_features
    DECODERS["video"] = video_header_features
    # pixel/sample-level scoring (no media library needed)
    DECODERS["image_pixels"] = image_pixel_features
    DECODERS["audio_samples"] = audio_sample_features
    from .audio import audio_spectral_features

    DECODERS["audio_spectral"] = audio_spectral_features


register_default_decoders()


def decode_features(df: DataFrame, modality_col: str = "modality", dim: int = 8) -> DataFrame:
    """payload -> features via mapInPandas. Real decoders come from DECODERS;
    unregistered modalities fall back to the deterministic stub (a production
    build would raise NotImplementedError instead — flip `strict=True`)."""

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != "payload"]
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, modality in zip(pdf["payload"], pdf[modality_col]):
                decoder = DECODERS.get(modality)
                if decoder is not None:
                    feats.append(decoder(bytes(payload)))
                else:
                    feats.append(deterministic_stub_decoder(bytes(payload), dim))
            out = pdf.drop(columns=["payload"])
            out["features"] = feats
            yield out

    return df.mapInPandas(_batches, schema=out_schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — runs entirely on plain columns, so Catalyst
    prunes the binary payload out of the scan (check ReadSchema)."""
    return df.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_s").alias("avg_duration_s"),
    )


def frame_sample_plan(df: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    TIMESTAMPS (decode stubbed). Shows the explode-side shape without
    touching payload bytes."""
    n_frames = F.greatest(F.floor(F.col("duration_s") / every_s).cast("int"), F.lit(1))
    return df.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * every_s)


def _sampled_frames(payload: bytes, every_n: int, max_frames: int):
    """Dispatch real frame decode by container → (n_frames, [(idx, array)])
    or None. GIF decodes sequentially up to max_frames (the animation model
    composites, so n_frames counts DECODED frames) then samples; MJPEG-AVI
    counts all chunks but entropy-decodes only the sampled ones."""
    if payload.startswith((b"GIF87a", b"GIF89a")):
        from .raster import decode_gif_frames

        frames = decode_gif_frames(payload, max_frames=max_frames)
        if not frames:
            return None
        return len(frames), [
            (i, frames[i]) for i in range(0, len(frames), every_n)
        ]
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from .video import decode_avi_frames

        return decode_avi_frames(payload, max_frames=max_frames, every_n=every_n)
    return None


def frame_sample_features(
    df: DataFrame,
    every_n: int = 1,
    max_frames: int = 16,
    thumb: tuple[int, int] = (8, 8),
) -> DataFrame:
    """REAL frame sampling: each video/animated-image row explodes into one
    row per sampled frame with a feature vector computed from the decoded,
    box-resized frame — decode → frame-sample → resize → feature-extract,
    the full video pipeline, real end-to-end for the containers decodable
    without codec libraries (animated GIF; MJPEG-in-AVI via the JPEG
    decoder). Rows whose payload isn't decodable yield zero rows
    (quarantine-by-omission; the metadata-level frame_sample_plan covers
    codec formats).

    Per frame: (frame_idx, n_frames, mean/std/min/max of the BT.601 luma
    of the ``thumb``-sized box-resized frame; grayscale frames use the
    channel directly). One Arrow map stage, no shuffle; memory bounded by
    max_frames x frame size per row."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    th, tw = thumb

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .raster import resize_box

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                sampled = _sampled_frames(bytes(payload), every_n, max_frames)
                if sampled is None:
                    continue
                n_frames, frames = sampled
                for idx, px in frames:
                    small = resize_box(px, th, tw).astype(np.float64)
                    if small.ndim == 3 and small.shape[2] >= 3:
                        luma = (
                            0.299 * small[:, :, 0]
                            + 0.587 * small[:, :, 1]
                            + 0.114 * small[:, :, 2]
                        )
                    else:
                        luma = small.reshape(small.shape[0], small.shape[1], -1)[:, :, 0]
                    rows.append(
                        (
                            int(media_id),
                            idx,
                            n_frames,
                            [
                                float(luma.mean()),
                                float(luma.std()),
                                float(luma.min()),
                                float(luma.max()),
                            ],
                        )
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "n_frames", "features"])

    return df.select("media_id", "payload").mapInPandas(_batches, schema=out_schema)
