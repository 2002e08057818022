"""Multimodal columns — image/audio/video as opaque binary columns with
typed metadata, processed batch-wise via mapInPandas (BASELINE extension).

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
DECODERS because the image/audio libraries aren't in this container —
swap in PIL/torchaudio implementations by registering a decoder.

Scale design: media rows are large, so operators here
  - never collect() or explode binaries;
  - process per Arrow batch (mapInPandas) so memory is bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch;
  - keep metadata in plain columns so filters (modality, size, dims) prune
    BEFORE any decode touches bytes.
"""

from __future__ import annotations

import hashlib
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
