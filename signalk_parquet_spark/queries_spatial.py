"""Spatial operators (SURVEY §2.2 P5-P7, §2.4 J5, §2.5 W5) — bbox with
antimeridian wraparound, haversine radius, two-phase spatial correlation
semi-join, distance traveled, and the GPS-glitch speed rule.

The `events` table has no coordinates, so each query derives deterministic
synthetic lat/lon from event_id (pure integer arithmetic — identical in both
engines). Engine code paths operate on real value_latitude/value_longitude
columns (operators/spatial.py); these queries exercise the same expressions.

Float caveat: libm sin/cos differ by ~1 ulp across engines, so oracles only
compare threshold MEMBERSHIP (safe: values live on a continuum) and
coarse-rounded sums — never finely-rounded trig outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.geo import bbox_predicate, haversine_m, radius_predicate
from .functions.time import ISO_BUCKET_FMT, bucket_iso, bucket_ts
from .registry import dd_bucket, load, register

H = 3600_000

# deterministic synthetic coordinates from event_id (lazy: Columns need a session)
def _lat():
    return (F.col("event_id") * 7919 % 18000) / 100.0 - 90.0


def _lon():
    return (F.col("event_id") * 104729 % 36000) / 100.0 - 180.0
_DD_LAT = "((event_id * 7919) % 18000) / 100.0 - 90.0"
_DD_LON = "((event_id * 104729) % 36000) / 100.0 - 180.0"

_DD_HAV = (
    "2 * 6371000.0 * asin(sqrt("
    "pow(sin(radians({lat2} - ({lat1})) / 2), 2) + "
    "cos(radians({lat1})) * cos(radians({lat2})) * pow(sin(radians({lon2} - ({lon1})) / 2), 2)))"
)


# --- P5: bbox with 180-meridian wraparound ------------------------------------
@register(
    "spatial_bbox_meridian",
    f"""
    WITH p AS (SELECT event_id, {_DD_LAT} AS lat, {_DD_LON} AS lon FROM events)
    SELECT event_id, lat, lon FROM p
    WHERE lat >= 40.0 AND lat <= 60.0 AND (lon >= 170.0 OR lon <= -170.0)
    """,
)
def spatial_bbox_meridian(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY P5 — bbox containment where west>east crosses the antimeridian
    and the longitude test flips to OR (spatial-queries.ts:145-152)."""
    e = load(spark, sf, "events").select("event_id", _lat().alias("lat"), _lon().alias("lon"))
    return e.filter(bbox_predicate(F.col("lat"), F.col("lon"), 40.0, 60.0, 170.0, -170.0))


# --- P6: radius (haversine) ------------------------------------------------------
@register(
    "spatial_radius",
    f"""
    WITH p AS (SELECT event_id, {_DD_LAT} AS lat, {_DD_LON} AS lon FROM events)
    SELECT event_id, lat, lon FROM p
    WHERE {_DD_HAV.format(lat1="50.0", lon1="10.0", lat2="lat", lon2="lon")} <= 500000.0
    """,
)
def spatial_radius(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY P6 — haversine radius filter (the reference's own SQL haversine
    form, aggregation-service.ts:549-561; no spatial extension needed)."""
    e = load(spark, sf, "events").select("event_id", _lat().alias("lat"), _lon().alias("lon"))
    # NB: the engine-path radius_predicate adds a bbox prefilter; the oracle
    # compares pure haversine membership, so use the exact test here.
    return e.filter(haversine_m(F.col("lat"), F.col("lon"), F.lit(50.0), F.lit(10.0)) <= 500000.0)


# --- J5: two-phase spatial correlation semi-join -----------------------------------
@register(
    "spatial_semi_join",
    f"""
    WITH p AS (SELECT *, {_DD_LAT} AS lat, {_DD_LON} AS lon FROM events),
    in_area_buckets AS (
      SELECT DISTINCT {dd_bucket(H)} AS bucket_ts FROM p
      WHERE lat >= 40.0 AND lat <= 60.0 AND lon >= 0.0 AND lon <= 30.0
    )
    SELECT {dd_bucket(H)} AS bucket_ts, count(*) AS n_purchases,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE event_type = 'purchase'
      AND {dd_bucket(H)} IN (SELECT bucket_ts FROM in_area_buckets)
    GROUP BY 1
    """,
)
def spatial_semi_join(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY J5 — the reference's two-phase spatial correlation: a cheap
    position pre-pass finds in-area bucket timestamps, then other series are
    semi-joined on bucket (HistoryAPI.ts:788-941,1925-1946 — there it's a JS
    Set; here a true left_semi join that stays distributed)."""
    e = load(spark, sf, "events")
    p = e.select("event_id", "ts", _lat().alias("lat"), _lon().alias("lon"))
    buckets = (
        p.filter(bbox_predicate(F.col("lat"), F.col("lon"), 40.0, 60.0, 0.0, 30.0))
        .select(bucket_iso("ts", H).alias("bucket_ts"))
        .distinct()
    )
    purchases = e.filter(F.col("event_type") == "purchase").withColumn(
        "bucket_ts", bucket_iso("ts", H)
    )
    return (
        purchases.join(buckets, "bucket_ts", "left_semi")
        .groupBy("bucket_ts")
        .agg(F.count(F.lit(1)).alias("n_purchases"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


# --- W5: distance traveled (lag + haversine) ----------------------------------------
@register(
    "dist_traveled_km",
    f"""
    WITH p AS (
      SELECT user_id, ts, {_DD_LAT} AS lat, {_DD_LON} AS lon FROM events
    ), legs AS (
      SELECT user_id,
             lag(lat) OVER (PARTITION BY user_id ORDER BY ts) AS plat,
             lag(lon) OVER (PARTITION BY user_id ORDER BY ts) AS plon,
             lat, lon
      FROM p
    )
    SELECT user_id,
           CAST(round(sum({_DD_HAV.format(lat1="plat", lon1="plon", lat2="lat", lon2="lon")}) / 1000.0, 0) AS BIGINT) AS dist_km,
           count(plat) AS n_legs
    FROM legs WHERE plat IS NOT NULL GROUP BY user_id
    """,
)
def dist_traveled_km(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY W5 — LAG(position) + haversine, summed per context
    (README.md:670-699's distance-traveled pattern)."""
    e = load(spark, sf, "events").select("user_id", "ts", _lat().alias("lat"), _lon().alias("lon"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").cast("timestamp"))
    legs = e.select(
        "user_id",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        "lat",
        "lon",
    ).filter(F.col("plat").isNotNull())
    leg = haversine_m(F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon"))
    return legs.groupBy("user_id").agg(
        F.round(F.sum(leg) / 1000.0, 0).cast("long").alias("dist_km"),
        F.count("plat").alias("n_legs"),
    )


# --- A12's glitch rule: implied-speed outlier count -----------------------------------
@register(
    "glitch_speed_legs",
    f"""
    WITH p AS (
      SELECT user_id, ts, {_DD_LAT} AS lat, {_DD_LON} AS lon FROM events
    ), legs AS (
      SELECT user_id, ts,
             lag(lat) OVER (PARTITION BY user_id ORDER BY ts) AS plat,
             lag(lon) OVER (PARTITION BY user_id ORDER BY ts) AS plon,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts,
             lat, lon
      FROM p
    )
    SELECT user_id,
           count(*) FILTER (
             {_DD_HAV.format(lat1="plat", lon1="plon", lat2="lat", lon2="lon")}
               / (CAST(epoch_ms(ts) - epoch_ms(pts) AS DOUBLE) / 1000.0) > 25.0
           ) AS n_glitch_legs,
           count(plat) AS n_legs
    FROM legs WHERE plat IS NOT NULL GROUP BY user_id
    """,
)
def glitch_speed_legs(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY A12's outlier rule — implied speed vs previous point > 25 m/s
    (POSITION_MAX_SPEED_MPS, reference src/constants.ts:17) counted per
    context via lag windows."""
    e = load(spark, sf, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), _lat().alias("lat"), _lon().alias("lon")
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    legs = e.select(
        "user_id",
        "ts",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
        F.lag("ts").over(w).alias("pts"),
        "lat",
        "lon",
    ).filter(F.col("plat").isNotNull())
    dist = haversine_m(F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon"))
    dt_s = (F.unix_millis(F.col("ts")) - F.unix_millis(F.col("pts"))).cast("double") / 1000.0
    return legs.groupBy("user_id").agg(
        F.count(F.when(dist / dt_s > 25.0, 1)).alias("n_glitch_legs"),
        F.count("plat").alias("n_legs"),
    )


# --- A12 end-to-end: glitch-scored representative point per bucket --------------
@register(
    "position_rollup_1h",
    f"""
    WITH p AS (
      SELECT CAST(user_id AS VARCHAR) AS context, 'navigation.position' AS path,
             ts, event_id, {_DD_LAT} AS lat, {_DD_LON} AS lon,
             CAST(floor(epoch_ms(ts)/{H})*{H} AS BIGINT) AS bms
      FROM events
      WHERE {_DD_LAT} BETWEEN -90.0 AND 90.0 AND {_DD_LON} BETWEEN -180.0 AND 180.0
    ), nb AS (
      SELECT *,
             lag(lat)  OVER w AS prev_lat, lag(lon)  OVER w AS prev_lon,
             lag(ts)   OVER w AS prev_ts,
             lead(lat) OVER w AS next_lat, lead(lon) OVER w AS next_lon,
             lead(ts)  OVER w AS next_ts
      FROM p WINDOW w AS (PARTITION BY context, path, bms ORDER BY ts, event_id)
    ), sc AS (
      SELECT *,
             (CASE WHEN prev_ts IS NULL THEN 1
                   WHEN {_DD_HAV.format(lat1="lat", lon1="lon", lat2="prev_lat", lon2="prev_lon")}
                 / greatest(CAST(abs(epoch_ms(prev_ts) - epoch_ms(ts)) AS DOUBLE) / 1000.0, 0.001)
                 <= 25.0 THEN 1 ELSE 0 END)
           + (CASE WHEN next_ts IS NULL THEN 1
                   WHEN {_DD_HAV.format(lat1="lat", lon1="lon", lat2="next_lat", lon2="next_lon")}
                 / greatest(CAST(abs(epoch_ms(next_ts) - epoch_ms(ts)) AS DOUBLE) / 1000.0, 0.001)
                 <= 25.0 THEN 1 ELSE 0 END)
             AS ok_score,
             epoch_ms(ts) - (bms + {H // 2}) AS mid_delta_ms
      FROM nb
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY context, path, bms
        ORDER BY ok_score DESC, CASE WHEN mid_delta_ms >= 0 THEN 0 ELSE 1 END,
                 abs(mid_delta_ms), ts, event_id) AS rn
      FROM sc
    ), stats AS (
      SELECT context, path, bms, count(*) AS sample_count,
             strftime(min(ts), '%Y-%m-%dT%H:%M:%SZ') AS first_ts,
             strftime(max(ts), '%Y-%m-%dT%H:%M:%SZ') AS last_ts
      FROM p GROUP BY 1, 2, 3
    )
    SELECT r.context, r.path,
           strftime(epoch_ms(r.bms), '%Y-%m-%dT%H:%M:%SZ') AS bucket_ts,
           r.lat AS value_latitude, r.lon AS value_longitude,
           stats.sample_count, stats.first_ts, stats.last_ts
    FROM r JOIN stats ON r.context = stats.context AND r.path = stats.path
                     AND r.bms = stats.bms
    WHERE r.rn = 1
    """,
)
def position_rollup_1h(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY A12 END-TO-END — the full position tier rollup, reference-
    EXACT since r8 (operators/rollup.rollup_position;
    aggregation-service.ts:593-635): per-BUCKET lag/lead neighbor legs
    (NULL-neighbor edges are trusted), implied-speed ok score (≤25 m/s,
    constants.ts:17, zero-dt legs clamped to 1 ms so duplicate-ts jumps
    ARE glitches), representative point = ROW_NUMBER()=1 by (ok_score
    desc, at-or-after-midpoint first, |ts − bucket midpoint|, ts,
    event_id) — all ranking keys are integers (the speed test is a
    continuum threshold, CLAUDE.md rule 4) and event_id makes the order
    TOTAL even under duplicate timestamps (no layout dependence — the
    threshold_transitions lesson), so the pick is engine-exact with no
    float ordering anywhere — joined to per-bucket sample stats.
    Complements glitch_speed_legs, which gates only the scoring rule."""
    e = load(spark, sf, "events").select(
        F.col("user_id").cast("string").alias("context"),
        F.lit("navigation.position").alias("path"),
        F.col("ts").cast("timestamp").alias("signalk_timestamp"),
        "event_id",
        _lat().alias("value_latitude"),
        _lon().alias("value_longitude"),
    )
    from .operators.rollup import rollup_position

    out = rollup_position(e, "1h", tiebreak_cols=("event_id",))
    return out.select(
        "context",
        "path",
        F.date_format("bucket_time", ISO_BUCKET_FMT).alias("bucket_ts"),
        "value_latitude",
        "value_longitude",
        "sample_count",
        F.date_format("first_timestamp", ISO_BUCKET_FMT).alias("first_ts"),
        F.date_format("last_timestamp", ISO_BUCKET_FMT).alias("last_ts"),
    )


# --- J6: spatial proximity self-join (the reference's documented example) ----------
#: proximity threshold. 1000 km (not the reference example's ~100 m): the
#: synthetic event coordinates are pseudo-uniform over the whole globe, so at
#: the driver's sf0.01 gate a 100 km threshold finds ZERO pairs and the gate
#: "passed" on 0-vs-0 — proving pair-absence, not pair-finding (round-2
#: verdict). 1000 km yields 100 real pairs at sf0.01 / 81k at sf0.1.
_PROX_M = 1_000_000.0
#: lat-band width must dominate the threshold's max meridional arc:
#: dlat_max = thr * 180 / (pi * 6371000) = 8.993 deg for 1000 km.
_PROX_BAND_DEG = 9.0

@register(
    "proximity_pairs",
    f"""
    WITH p AS (
      SELECT user_id, event_id, {dd_bucket(H)} AS bucket_ts,
             {_DD_LAT} AS lat, {_DD_LON} AS lon
      FROM events
    )
    SELECT a.bucket_ts, a.user_id AS user_a, b.user_id AS user_b,
           a.event_id AS event_a, b.event_id AS event_b
    FROM p a JOIN p b
      ON a.bucket_ts = b.bucket_ts AND a.user_id < b.user_id
    WHERE {_DD_HAV.format(lat1="a.lat", lon1="a.lon", lat2="b.lat", lon2="b.lon")} < {_PROX_M}
    """,
)
def proximity_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY J6 — vessel-proximity self-join (reference README.md:701-718):
    same time bucket, different context, within distance. The time bucket is
    the equi-join key, so the cross product is bounded per bucket; the
    haversine is a post-join threshold filter (membership-safe for the
    oracle).

    Perf/scale: a latitude-band GRID JOIN instead of a per-bucket cross
    product. haversine < thr requires |dlat| < thr*180/(pi*6371000) deg (the
    meridional arc lower-bounds haversine), so any matching pair lies in the
    same or adjacent floor(lat/band) band with band >= that arc. One side
    explodes to its 3 candidate bands and the band joins as an EQUI-key next
    to the time bucket — the trig runs only on same/adjacent-band pairs, and
    the (bucket x band) key space keeps every shuffle partition busy (a
    bucket-only key collapses to one task per hour at any scale). The numeric
    bucket joins; ISO formatting happens on survivors."""
    e = load(spark, sf, "events").select(
        "user_id", "event_id", bucket_ts("ts", H).alias("b_ts"),
        _lat().alias("lat"), _lon().alias("lon"),
    ).withColumn("band", F.floor(F.col("lat") / _PROX_BAND_DEG).cast("long"))
    a = e.alias("a")
    b = e.withColumn(
        "band", F.explode(F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1))
    ).alias("b")
    dist = haversine_m(F.col("a.lat"), F.col("a.lon"), F.col("b.lat"), F.col("b.lon"))
    return (
        a.join(
            b,
            (F.col("a.b_ts") == F.col("b.b_ts"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .filter(dist < _PROX_M)
        .select(
            F.date_format(F.col("a.b_ts"), ISO_BUCKET_FMT).alias("bucket_ts"),
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
        )
    )
