"""Advanced relational coverage: as-of join, interval join, sessionization,
CUBE grouping, distinct-agg + dispersion stats, and the reference's A13
object/component aggregation with JSON reconstruction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.time import bucket_iso, iso_utc
from .operators.asof import asof_join_window, interval_join
from .registry import dd_bucket, dd_micro_avg, load, micro_avg, register

H = 3600_000


# --- as-of join (backward): each error sees the user's latest prior purchase ----
@register(
    "asof_last_purchase",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'purchase' THEN value END AS pv,
             (event_type <> 'purchase') AS is_left
      FROM events WHERE event_type IN ('error', 'purchase')
    ), carried AS (
      SELECT *, last_value(pv IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, is_left
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
      FROM tagged
    )
    SELECT user_id, event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso, last_purchase_value
    FROM carried WHERE event_type = 'error'
    """,
)
def asof_last_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """As-of (backward) join via the zero-join window strategy
    (operators/asof.asof_join_window): one shuffle on user_id, no theta join."""
    e = load(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    errors = e.filter(F.col("event_type") == "error").select("user_id", "ts", "event_id")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join_window(
        errors, purchases, ["user_id"], "ts", "value", out_col="last_purchase_value"
    )
    return out.select("user_id", "event_id", iso_utc("ts").alias("ts_iso"), "last_purchase_value")


# --- interval join: error/purchase pairs within 10 minutes, same user ------------
_TOL = 600_000
@register(
    "interval_join_pairs",
    f"""
    SELECT a.user_id, a.event_id AS error_id, b.event_id AS purchase_id,
           epoch_ms(a.ts) - epoch_ms(b.ts) AS dt_ms
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
      ON a.user_id = b.user_id AND abs(epoch_ms(a.ts) - epoch_ms(b.ts)) <= {_TOL}
    """,
)
def interval_join_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Interval (range) join via bucketized equi-join (operators/asof.
    interval_join) — the oracle states the same semantics as a theta join;
    the Spark plan never builds the cross product."""
    e = load(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("ets"), F.col("event_id").alias("error_id")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("purchase_id")
    )
    pairs = interval_join(errors, purchases, ["user_id"], "ets", "pts", _TOL)
    return pairs.select(
        "user_id",
        "error_id",
        "purchase_id",
        (F.unix_millis("ets") - F.unix_millis("pts")).alias("dt_ms"),
    )


# --- sessionization: 30-minute inactivity gap --------------------------------------
@register(
    "sessionize_30m",
    """
    WITH g AS (
      SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events
    ), marked AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM g
    ), sessions AS (
      SELECT user_id, ts,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM marked
    )
    SELECT user_id, session_id, strftime(min(ts), '%Y-%m-%dT%H:%M:%SZ') AS session_start,
           count(*) AS n_events,
           epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize_30m(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization: lag-gap > 30 min starts a session; cumulative sum
    numbers them (the batch twin of F.session_window in streaming)."""
    e = load(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts")
    marked = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_ts").isNull()
            | ((F.unix_millis("ts") - F.unix_millis("prev_ts")) > 1_800_000),
            1,
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("session_start"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
    )


# --- CUBE grouping sets ---------------------------------------------------------------
@register(
    "cube_returnflag_status",
    """
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n, grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def cube_returnflag_status(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets with grouping() indicators (beyond the reference's
    surface — its tier hierarchy is its only 'rollup'; SURVEY §2.3 note)."""
    li = load(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
    )


# --- distinct aggregate + dispersion ----------------------------------------------------
@register(
    "distinct_and_stddev",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_users,
           round(stddev_samp(value), 6) AS sd, round(var_samp(value), 4) AS var
    FROM events GROUP BY 1
    """,
)
def distinct_and_stddev(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.stddev_samp("value"), 6).alias("sd"),
        F.round(F.var_samp("value"), 4).alias("var"),
    )


# --- A13: object/component aggregation + JSON reconstruction -----------------------------
@register(
    "object_component_agg",
    f"""
    SELECT event_type, {dd_bucket(H)} AS bucket_ts,
           CAST(round(avg(CAST(props->>'k' AS BIGINT)), 0) AS BIGINT) AS k_avg,
           '{{"k":' || CAST(round(avg(CAST(props->>'k' AS BIGINT)), 0) AS BIGINT) || '}}' AS value_json
    FROM events GROUP BY 1, 2
    """,
)
def object_component_agg(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY A13 — object paths aggregate per flattened component, then the
    object is RECONSTRUCTED from aggregated components
    (HistoryAPI.ts:1578-1717,2560-2577). Here: props.k -> avg -> rebuilt JSON."""
    e = load(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    agged = e.groupBy("event_type", bucket_iso("ts", H).alias("bucket_ts")).agg(
        F.round(F.avg(k), 0).cast("long").alias("k_avg")
    )
    return agged.withColumn(
        "value_json", F.concat(F.lit('{"k":'), F.col("k_avg").cast("string"), F.lit("}"))
    )


# --- scalar subquery: customers above global average balance ----------------------
@register(
    "scalar_subquery_acctbal",
    """
    SELECT c_custkey, round(c_acctbal, 2) AS acctbal
    FROM customer WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    """,
)
def scalar_subquery_acctbal(spark: SparkSession, sf: str) -> DataFrame:
    """Uncorrelated scalar subquery (Catalyst plans it as a broadcast of the
    single aggregated value). Threshold membership on a continuum, so the
    float average is oracle-safe without rounding."""
    c = load(spark, sf, "customer")
    c.createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_custkey, round(c_acctbal, 2) AS acctbal
        FROM customer_v WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
        """
    )


# --- value histogram (fixed-width buckets) -----------------------------------------
@register(
    "value_histogram",
    """
    SELECT CAST(floor(value / 50.0) AS BIGINT) AS bin, count(*) AS n,
           min(value) AS bin_min, max(value) AS bin_max
    FROM events GROUP BY 1
    """,
)
def value_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram via integer bucketing (the distributed form of
    a histogram sketch: one hash aggregate, no sort)."""
    e = load(spark, sf, "events")
    return e.groupBy(F.floor(F.col("value") / 50.0).cast("long").alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("bin_min"),
        F.max("value").alias("bin_max"),
    )


# --- rate of change (discrete derivative) per series ---------------------------------
@register(
    "rate_of_change",
    f"""
    WITH a AS (
      SELECT event_type, {dd_bucket(H)} AS bucket_ts, round({dd_micro_avg("value")}, 6) AS avg_value
      FROM events GROUP BY 1, 2
    ), d AS (
      SELECT event_type, bucket_ts, avg_value,
             lag(avg_value) OVER (PARTITION BY event_type ORDER BY bucket_ts) AS prev_v
      FROM a
    )
    SELECT event_type, bucket_ts, round(avg_value - prev_v, 6) AS delta
    FROM d WHERE prev_v IS NOT NULL
    """,
)
def rate_of_change(spark: SparkSession, sf: str) -> DataFrame:
    """Discrete derivative of the bucketed series (lag difference) — the
    'trend' post-processor shape. Subtraction of two already-rounded doubles
    then round: both engines do identical IEEE ops."""
    e = load(spark, sf, "events")
    a = e.groupBy("event_type", bucket_iso("ts", H).alias("bucket_ts")).agg(
        F.round(micro_avg("value"), 6).alias("avg_value")
    )
    w = Window.partitionBy("event_type").orderBy("bucket_ts")
    return (
        a.withColumn("prev_v", F.lag("avg_value").over(w))
        .filter(F.col("prev_v").isNotNull())
        .select(
            "event_type",
            "bucket_ts",
            F.round(F.col("avg_value") - F.col("prev_v"), 6).alias("delta"),
        )
    )


# --- calendar functions: daily activity profile ---------------------------------------
@register(
    "daily_activity",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%dT%H:%M:%SZ') AS day_ts,
           CAST(strftime(ts, '%w') AS BIGINT) AS dow,
           count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def daily_activity(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY §2.7 date/time functions: date_trunc + day-of-week extraction
    (DuckDB %w is 0=Sunday; Spark dayofweek is 1=Sunday)."""
    e = load(spark, sf, "events")
    ts = F.col("ts").cast("timestamp")
    return e.groupBy(
        F.date_format(F.date_trunc("day", ts), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("day_ts"),
        (F.dayofweek(ts) - 1).cast("long").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users"))


# regex_extract_tokens and unpivot_aligned live in queries_text.py (they
# ceded their r4 window slots to never-checked gates; r5 rotated them back
# in via registry._WINDOW_FIRST, which now manages the window explicitly).


# --- ranking functions beyond ROW_NUMBER (rank / dense_rank / ntile) ------------------
@register(
    "ranking_functions",
    """
    SELECT o_custkey, o_orderkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def ranking_functions(spark: SparkSession, sf: str) -> DataFrame:
    """rank/dense_rank/ntile — beyond the reference's ROW_NUMBER-only window
    surface (SURVEY §2.5 note). The ORDER BY is made unique (orderkey
    tie-break) so ntile's tie placement is deterministic across engines."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )
