"""SignalK delta-JSON ingestion — the reference's actual wire format,
parsed declaratively.

The reference's data-handler subscribes to the server's delta stream and
builds DataRecords imperatively (data-handler.ts:209-214 explode
updates/values; :634-695 record construction: `$source` || source.label,
source type/pgn/src, scalar vs object values, per-key value_<k>
flattening, and the META-ONLY-update skip — an object whose keys are all
in {units, meta, description, displayUnits, zones, timeout} is a metadata
update, not data). This module is the same transform as a pure DataFrame
plan, usable identically in batch (replayed delta logs) and readStream
(live feed) — mapInPandas never enters.

Spark-first: the arbitrary-typed `value` field (number | string | bool |
object) is parsed as a Spark 4 VARIANT, dispatched on schema_of_variant
(try_variant_get alone would COERCE — a JSON string "5.25" casts to
double, which the reference's typeof dispatch would not do), and
flattened via try_variant_get paths for the caller-declared object
columns (the flattened column SET is schema-service territory — per
(context, path) — so it is an explicit argument, not runtime discovery).

Determinism deviations, documented: (1) the reference stamps
received_timestamp = now() at arrival (:635); this transform defaults it
to the update's own timestamp so replays and tests are reproducible —
pass ``received=F.current_timestamp()`` for arrival-time semantics.
(2) an update WITHOUT a timestamp falls back to now() in the reference
(:636); here it is DROPPED (a deterministic transform cannot invent an
event time) — callers that want the reference's behavior can
pre-coalesce the wire frame's timestamp with current_timestamp() before
this transform.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: keys that mark an object value as a metadata update (data-handler.ts:665-672)
META_ONLY_KEYS = ("units", "meta", "description", "displayUnits", "zones", "timeout")

#: from_json schema for one SignalK delta message
DELTA_SCHEMA = (
    "context string, updates array<struct<"
    "timestamp string, `$source` string, "
    "source struct<label string, type string, pgn double, src string>, "
    "values array<struct<path string, value variant>>>>"
)


def deltas_to_records(
    df: DataFrame,
    delta_col: str = "delta",
    default_context: str = "vessels.self",
    value_columns: Mapping[str, str] | None = None,
    received: Column | None = None,
) -> DataFrame:
    """Delta JSON strings -> DataRecord rows (one per values[] entry).

    ``value_columns``: object properties to flatten into value_<name>
    columns, name -> variant cast type ("double" | "string" | "boolean").
    """
    d = F.from_json(F.col(delta_col), DELTA_SCHEMA)
    u = df.select(
        F.coalesce(d["context"], F.lit(default_context)).alias("context"),
        F.explode(d["updates"]).alias("u"),
    )
    v = u.select(
        "context",
        F.to_timestamp(
            F.regexp_replace(F.col("u.timestamp"), "Z$", "+00:00")
        ).alias("signalk_timestamp"),
        F.col("u.`$source`").alias("dollar_source"),
        F.col("u.source").alias("src_obj"),
        F.explode("u.values").alias("pv"),
    ).select(
        "context",
        "signalk_timestamp",
        "dollar_source",
        "src_obj",
        F.col("pv.path").alias("path"),
        F.col("pv.value").alias("val"),
    )
    vt = F.schema_of_variant("val")
    is_obj = vt.startswith("OBJECT")
    is_str = vt == F.lit("STRING")
    is_bool = vt == F.lit("BOOLEAN")
    is_null = vt == F.lit("VOID")
    # meta-only skip: every object key within META_ONLY_KEYS
    keys = F.json_object_keys(F.to_json("val"))
    meta_only = is_obj & (
        F.size(F.array_except(keys, F.array(*[F.lit(k) for k in META_ONLY_KEYS]))) == 0
    )
    rec_ts = F.col("signalk_timestamp")
    out_cols = [
        (received if received is not None else rec_ts).alias("received_timestamp"),
        rec_ts.alias("signalk_timestamp"),
        "context",
        "path",
        F.when(~is_obj & ~is_str & ~is_bool & ~is_null,
               F.try_variant_get("val", "$", "double")).alias("value"),
        F.when(is_str, F.try_variant_get("val", "$", "string")).alias("value_text"),
        F.when(is_bool, F.try_variant_get("val", "$", "boolean")).alias("value_bool"),
        F.when(is_obj, F.to_json("val")).alias("value_json"),
        F.when(F.col("src_obj").isNotNull(), F.to_json("src_obj")).alias("source"),
        # $source wins; fall back to source.label (data-handler.ts:306)
        F.coalesce("dollar_source", F.col("src_obj.label")).alias("source_label"),
        F.col("src_obj.type").alias("source_type"),
        F.col("src_obj.pgn").alias("source_pgn"),
        F.col("src_obj.src").alias("source_src"),
        F.lit(None).cast("string").alias("meta"),
    ]
    for name, cast in (value_columns or {}).items():
        out_cols.append(
            F.when(is_obj, F.try_variant_get("val", f"$.{name}", cast))
            .alias(f"value_{name}")
        )
    return v.filter(~meta_only & F.col("signalk_timestamp").isNotNull()).select(*out_cols)
