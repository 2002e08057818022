"""Line-format ingestion sources — JSONL and CSV feeds into DataRecords.

The reference ingests only live SignalK deltas and GPX files; real
deployments also replay exported logs (JSON-lines) and spreadsheet-ish
sensor dumps (CSV). Both readers are fully declarative — Spark's native
json/csv sources with an EXPLICIT schema, so:

- no inference pre-scan (schema inference reads the whole input once
  before the real scan — at 100 TB that doubles the job; an explicit
  schema also pins types against drift);
- column pruning and predicate pushdown work like any other scan
  (json/csv support pruning; filters evaluate during parsing);
- malformed lines follow Spark's PERMISSIVE mode into a quarantine
  column instead of failing the job (the schema_repair posture).

Timestamps arrive as ISO-8601 strings ("Z" or offset) and convert via
to_timestamp; everything downstream (lake writes, rollups, history) sees
the same DataRecord shape the live stream produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the wire shape of one exported observation line
FEED_FIELDS = [
    T.StructField("ts", T.StringType()),
    T.StructField("context", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("value_text", T.StringType()),
    T.StructField("source_label", T.StringType()),
]
FEED_SCHEMA = T.StructType(FEED_FIELDS + [T.StructField("_corrupt", T.StringType())])


def _to_records(df: DataFrame) -> DataFrame:
    """Feed rows -> DataRecord columns (the lake's ingest shape)."""
    ts = F.to_timestamp(F.regexp_replace("ts", "Z$", "+00:00"))
    return df.filter(F.col("_corrupt").isNull() & F.col("ts").isNotNull()).select(
        ts.alias("received_timestamp"),
        ts.alias("signalk_timestamp"),
        "context",
        "path",
        "value",
        "value_text",
        F.lit(None).cast("boolean").alias("value_bool"),
        F.lit(None).cast("string").alias("value_json"),
        F.to_json(F.struct(F.col("source_label").alias("label"))).alias("source"),
        "source_label",
        F.lit("import").alias("source_type"),
        F.lit(None).cast("double").alias("source_pgn"),
        F.lit(None).cast("string").alias("source_src"),
        F.lit(None).cast("string").alias("meta"),
    )


def quarantined_lines(df_raw: DataFrame) -> DataFrame:
    """The lines the permissive parse rejected — route to quarantine like
    operators/schema_repair, never silently drop. Spark disallows querying
    ONLY the corrupt column from a raw json/csv scan (column pruning would
    reduce any projection to it —
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), so this follows
    the engine's documented recipe: cache the parsed scan, then filter.
    The cache is the audit feed itself — bounded, and reused by the
    record-side read when both run in one job."""
    return (
        df_raw.cache()
        .filter(F.col("_corrupt").isNotNull())
        .select("_corrupt")
    )


def read_jsonl_records(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines feed -> DataRecords. Explicit schema (no inference
    pre-scan); malformed lines land in the _corrupt column (PERMISSIVE)
    and are filtered here — fetch them via read_jsonl_raw +
    quarantined_lines when auditing."""
    return _to_records(read_jsonl_raw(spark, path))


def read_jsonl_raw(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema(FEED_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def read_csv_records(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """CSV feed -> DataRecords, same contract as read_jsonl_records."""
    df = (
        spark.read.schema(FEED_SCHEMA)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
    )
    return _to_records(df)
