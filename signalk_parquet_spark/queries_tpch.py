"""TPC-H-shaped analytical queries over the star schema — the joins/agg/sort
coverage (SURVEY §2.4, §2.6) and the bench heads.

The reference has no star-schema queries of its own (it's a time-series
store), but its raw-SQL passthrough endpoint (S12, src/api-routes.ts:447-541)
exposes exactly this capability: arbitrary read-only analytical SQL over the
parquet lake. These queries are that surface, executed by Catalyst.

Scale notes: region/nation/customer/supplier/part are dimension tables —
Catalyst broadcasts them (verified via explain; AQE converts to broadcast
joins at runtime from size stats). lineitem⋈orders is the one genuine
shuffle; both sides hash-partition on the order key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, register


# --- TPC-H Q1: pricing summary (wide agg) -----------------------------------
@register(
    "tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    # <= '1998-09-02' == < next microsecond; stated in the loader's ts_range
    # so it pushes into the parquet scan (see registry.load docstring)
    li = load(spark, sf, "lineitem", ts_range=("l_shipdate", None, "1998-09-02T00:00:00.000001Z"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3: shipping priority (3-way join + top-k) -------------------------
@register(
    "tpch_q3",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf, "orders", ts_range=("o_orderdate", None, "1998-01-01T00:00:00Z"))
    li = load(spark, sf, "lineitem", ts_range=("l_shipdate", "1998-01-01T00:00:00.000001Z", None))
    # customer is a dimension — broadcast it; lineitem⋈orders shuffles on the
    # order key (the natural co-partitioning at scale).
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format(F.col("o_orderdate").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "orderdate", "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q5: local supplier volume (6-way join) ------------------------------
@register(
    "tpch_q5",
    """
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
    GROUP BY n_name
    """,
)
def tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    cust = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    supp = load(spark, sf, "supplier")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


# --- TPC-H Q6: forecasting revenue (filter-heavy scan — pushdown showcase) ------
@register(
    "tpch_q6",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    li = load(
        spark, sf, "lineitem",
        ts_range=("l_shipdate", "1997-01-01T00:00:00Z", "1998-01-01T00:00:00Z"),
    )
    return (
        li.filter(F.col("l_discount").between(0.03, 0.07) & (F.col("l_quantity") < 24))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- semi-join (J5 shape): orders having a high-value lineitem -------------------
@register(
    "semi_join_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_extendedprice > 90000)
    """,
)
def semi_join_orders(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY J5 — the spatial timestamp semi-join's generic form: filter one
    table by key membership of another (a true left_semi, not a JS Set)."""
    orders = load(spark, sf, "orders")
    keys = load(spark, sf, "lineitem").filter(F.col("l_extendedprice") > 90000).select("l_orderkey")
    return orders.join(keys, orders.o_orderkey == keys.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


# --- W1/W4: ranking window — top order per customer ------------------------------
@register(
    "rank_orders_per_customer",
    """
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice FROM r WHERE rn = 1
    """,
)
def rank_orders_per_customer(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY W1/W4 — ROW_NUMBER ranking with multi-key ORDER BY."""
    from pyspark.sql import Window

    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# --- W2: lag/lead — gap between consecutive orders per customer -------------------
@register(
    "order_gaps",
    """
    WITH g AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           epoch_ms(o_orderdate) - epoch_ms(prev_date) AS gap_ms
    FROM g WHERE prev_date IS NOT NULL
    """,
)
def order_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """SURVEY W2 — LAG over (PARTITION BY key ORDER BY ts), the reference's
    GPS-glitch neighbor pattern (aggregation-service.ts:593-623)."""
    from pyspark.sql import Window

    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ts = F.col("o_orderdate").cast("timestamp")
    return (
        orders.withColumn("prev_date", F.lag(ts).over(w))
        .filter(F.col("prev_date").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            (F.unix_millis(ts) - F.unix_millis(F.col("prev_date"))).alias("gap_ms"),
        )
    )


# --- TPC-H Q7 shape: trade volume by (supplier nation, customer nation, year) ------
@register(
    "tpch_q7",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT))
                AS BIGINT) / 10000.0 AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping), adapted to the synthetic schema:
    full supplier-nation × customer-nation × ship-year trade matrix. The
    fact-side join is lineitem⋈orders on the order key; everything else is
    a broadcast dimension. Revenue is summed in integer 1e-4 units (the
    per-row product is deterministic; the float SUM is not — 4363 small
    groups hit round(2) half-boundaries 9 times) then divided once, the
    CLAUDE.md rule-2 micro-space pattern."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    supp = load(spark, sf, "supplier")
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("timestamp")).cast("long").alias("l_year"),
        )
        .agg(
            (
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
                    ).cast("long")
                )
                / F.lit(10000.0)
            ).alias("revenue")
        )
    )


# --- TPC-H Q10 shape: returned-item reporting (top 20 customers) -------------------
@register(
    "tpch_q10",
    """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           c_acctbal, n_name, c_mktsegment
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items, top-20 customers.
    Aggregation keys ride along the broadcast customer dimension; the sort
    is a 20-row top-k (takeOrdered, no full sort at scale)."""
    li = load(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q14 shape: promotion revenue share (conditional aggregation) ------------
@register(
    "tpch_q14",
    """
    SELECT round(sum(CASE WHEN p_type = 'PROMO'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
             AS promo_revenue,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    """,
)
def tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a broadcast part join.
    Emits the two rounded sums, not their quotient — a float-quotient final
    step is the one rounding pattern the oracle hash can't absorb (see
    CLAUDE.md rule 2); the caller divides."""
    li = load(
        spark, sf, "lineitem",
        ts_range=("l_shipdate", "1997-01-01T00:00:00Z", "1998-01-01T00:00:00Z"),
    )
    part = load(spark, sf, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0))), 2
            ).alias("promo_revenue"),
            F.round(F.sum(disc_price), 2).alias("total_revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- TPC-H Q18 shape: large-volume orders (agg-filter join back to facts) ----------
_Q18_QTY = 300


@register(
    "tpch_q18",
    f"""
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS orderdate,
           o_totalprice, round(sum_qty, 2) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_QTY}
    ) big
    JOIN orders ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: customers with large-volume orders. The HAVING
    screen shrinks the fact aggregate to a handful of keys, which then
    broadcasts back against orders — the aggregate-then-semi-enrich plan,
    not a re-scan. Threshold comparison on the double sum is
    continuum-safe (CLAUDE.md rule 4); the emitted sum is rounded."""
    li = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders")
    cust = load(spark, sf, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > _Q18_QTY)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format(
                F.col("o_orderdate").cast("timestamp"), "yyyy-MM-dd'T'HH:mm:ss'Z'"
            ).alias("orderdate"),
            "o_totalprice",
            F.round(F.col("sum_qty"), 2).alias("sum_qty"),
        )
    )
