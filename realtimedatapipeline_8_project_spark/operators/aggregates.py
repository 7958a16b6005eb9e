"""Aggregation operator family (SURVEY §2.6).

The reference computes no groupBy itself (strictly per-event derives,
stream-processor.py:270-280) but its serving layout exists to answer
rollup-style analytics (cassandra-setup.cql:22, README.md:10 "drop-off
detection"). This module is the oracle-checked aggregation suite: hash
aggregates with partial (map-side) combine, multi-way joins with broadcast
dimensions, rollup/cube grouping sets, exact + approximate distinct.

Scale notes: every groupBy here shuffles only the grouped keys after a
map-side partial aggregate; dimension joins (nation/region/customer at
realistic scales) are broadcast so the 100 TB fact side never shuffles for
the join — only the final few-key aggregate exchanges data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import (
    DEC,
    davg,
    dsum,
    dsum_product,
    oracle_davg,
    oracle_dsum,
    oracle_dsum_product,
)
from ..sources.tables import load_table


# --- TPC-H Q1-shaped pricing summary (hash agg, map-side combine) ---------
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum_product(
                F.col("l_extendedprice"),
                F.lit(1.0) - F.col("l_discount"),
                "sum_disc_price",
            ),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity', 'sum_qty')},
  {oracle_dsum('l_extendedprice', 'sum_base_price')},
  {oracle_dsum_product('l_extendedprice', '1.0 - l_discount', 'sum_disc_price')},
  {oracle_davg('l_quantity', 'avg_qty')},
  {oracle_davg('l_extendedprice', 'avg_price')},
  {oracle_davg('l_discount', 'avg_disc')},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q5-shaped multiway join + agg (broadcast dims) -----------------
# customer/orders/lineitem shuffle on join keys only; nation+region are
# broadcast. At 100 TB the orders<->lineitem join is the one real shuffle;
# co-partitioning/bucketing both on orderkey removes even that.
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            dsum_product(
                F.col("l_extendedprice"),
                F.lit(1.0) - F.col("l_discount"),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_REVENUE_BY_NATION = f"""
SELECT
  r_name,
  n_name,
  {oracle_dsum_product('l_extendedprice', '1.0 - l_discount', 'revenue')},
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


# --- ROLLUP grouping sets --------------------------------------------------
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sum_qty"),
    )


ORACLE_ROLLUP = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       {oracle_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- CUBE grouping sets ----------------------------------------------------
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", "sum_price"),
    )


ORACLE_CUBE = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {oracle_dsum('o_totalprice', 'sum_price')}
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- exact distinct counts -------------------------------------------------
# approx_count_distinct (HLL) is the scale path but is engine-specific, so
# the oracle-checked query uses exact COUNT(DISTINCT); the approximate
# variant lives in q_approx_distinct (rows-only check).
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("n_buyers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


ORACLE_DISTINCT_COUNTS = """
SELECT c_mktsegment,
       COUNT(DISTINCT o_custkey) AS n_buyers,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct — the 100 TB-scale path (single pass, no
    distinct shuffle, fixed-size sketch). Rows-only check (engine-specific
    estimates); exactness is covered by q_distinct_counts."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_buyers")
    )


# --- top-k over an aggregate (agg + TakeOrderedAndProject) ----------------
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(dsum("o_totalprice", "total_spend"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("total_spend"), F.asc("o_custkey"))
        .limit(10)
    )


ORACLE_TOP_CUSTOMERS = f"""
SELECT o_custkey,
       {oracle_dsum('o_totalprice', 'total_spend')},
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY total_spend DESC, o_custkey ASC
LIMIT 10
"""


# --- TPC-H Q3-shaped shipping priority ------------------------------------
# The classic selective multi-join top-k: both date predicates and the
# segment filter push to their scans, the orders<->lineitem join is the
# one real shuffle, and the final ranking is TakeOrderedAndProject
# (per-partition heap, no global sort). The customer side carries NO
# broadcast hint: customer grows linearly with scale (~10B rows at TPC-H
# 100 TB, where the classic plan shuffles it), so strategy choice belongs
# to the optimizer — auto-broadcast under the size threshold locally, AQE
# runtime switch at scale (tests/test_plans.py pins that the hint-free
# plan still broadcasts at test SF, proving the hint was redundant).
# Fixed-cardinality dims (nation: 25 rows, region: 5) keep their hints —
# they are scale-invariant by schema.
Q3_DATE = "1995-03-15"
Q3_SEGMENT = "BUILDING"


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < F.lit(Q3_DATE).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum_product(
                F.col("l_extendedprice"),
                F.lit(1.0) - F.col("l_discount"),
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- TPC-H Q10 shape: returned-item revenue report ------------------------
# The classic "who returned the most revenue last quarter" 4-table join:
# lineitem filtered to returned rows AT THE SCAN (PushedFilters), orders
# pruned to one quarter, ONE fact-fact shuffle join on orderkey, then the
# customer->nation dim chain (nation broadcast-hinted — 25 rows by
# schema; customer hint-free, since it scales with the data: the
# optimizer broadcasts it below threshold and shuffles it at 100x, the
# classic Q10 plan); a single agg shuffle on custkey feeds
# TakeOrderedAndProject. Exact revenue via decimal dsum_product.

Q10_START = "1996-01-01"
Q10_END = "1996-04-01"


def q_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    dim = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "c_acctbal", "n_name")
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(Q10_START).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(Q10_END).cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dsum_product(
                F.col("l_extendedprice"),
                F.lit(1.0) - F.col("l_discount"),
                "revenue",
            )
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_RETURNED_ITEM = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {oracle_dsum_product('l_extendedprice', '1.0 - l_discount', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{Q10_START}'
  AND o_orderdate < TIMESTAMP '{Q10_END}'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- TPC-H Q18 shape: large-volume customers -------------------------------
# HAVING over an aggregate: find orders whose total quantity exceeds a
# threshold, then report them with their customers. The classic spelling
# re-scans lineitem through an IN subquery; the Spark-first plan
# aggregates lineitem ONCE (map-side combined, exact decimal) and joins
# the tiny qualifying set back to orders + the customer dim (hint-free:
# customer scales with the data, so the optimizer broadcasts below
# threshold and shuffles at 100x — the classic Q18 plan) — same result,
# half the fact scans. The threshold compare runs on the exact DECIMAL
# sum in both engines, so qualification is deterministic.

Q18_MIN_QTY = 300


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sq"))
        .where(F.col("sq") > Q18_MIN_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.round(F.col("sq"), 2).cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE_LARGE_VOLUME = f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(27,6))) AS sq
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(27,6))) > {Q18_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(ROUND(sq, 2) AS DOUBLE) AS sum_qty
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


ORACLE_SHIPPING_PRIORITY = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {oracle_dsum_product('l_extendedprice', '1.0 - l_discount', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


QUERIES = {
    "agg_shipping_priority": (q_shipping_priority, ORACLE_SHIPPING_PRIORITY),
    "agg_returned_item_report": (q_returned_item_report, ORACLE_RETURNED_ITEM),
    "agg_large_volume_customers": (q_large_volume_customers, ORACLE_LARGE_VOLUME),
    "agg_pricing_summary": (q_pricing_summary, ORACLE_PRICING_SUMMARY),
    "agg_revenue_by_nation": (q_revenue_by_nation, ORACLE_REVENUE_BY_NATION),
    "agg_rollup": (q_rollup, ORACLE_ROLLUP),
    "agg_cube": (q_cube, ORACLE_CUBE),
    "agg_distinct_counts": (q_distinct_counts, ORACLE_DISTINCT_COUNTS),
    "agg_approx_distinct": (q_approx_distinct, None),
    "agg_top_customers": (q_top_customers, ORACLE_TOP_CUSTOMERS),
}


# --- deterministic mode + interpolated median -----------------------------
# F.mode is tie-arbitrary in Spark (and DuckDB's mode likewise), so the
# mode here is computed explicitly: per-group value counts ranked by
# (count DESC, value ASC) — deterministic in any engine. Median uses both
# engines' exact interpolated percentile on the same input bits.


def q_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    lin = load_table(spark, sf_dir, "lineitem")
    counts = lin.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("cnt"), F.asc("l_quantity")
    )
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_returnflag", F.col("l_quantity").alias("mode_qty"))
    )
    medians = lin.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.count(F.lit(1)).alias("n"),
    )
    return medians.join(modes, "l_returnflag")


ORACLE_MODE_MEDIAN = """
WITH counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_returnflag, l_quantity
), modes AS (
  SELECT l_returnflag, l_quantity AS mode_qty
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
          ORDER BY cnt DESC, l_quantity ASC) AS rn FROM counts)
  WHERE rn = 1
), medians AS (
  SELECT l_returnflag, median(l_quantity) AS median_qty, COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag
)
SELECT m.l_returnflag, m.median_qty, m.n, o.mode_qty
FROM medians m JOIN modes o USING (l_returnflag)
"""

QUERIES["agg_mode_median"] = (q_mode_median, ORACLE_MODE_MEDIAN)


# --- sort-free per-group top-1 --------------------------------------------
# The window form (row_number()=1) must sort every group, and max over a
# STRUCT falls back to SortAggregate (structs aren't hash-aggregatable in
# Spark). Encoding the (value, tiebreak) order into one bigint keeps the
# whole thing a plain HashAggregate with map-side partial combine —
# max_by over a UNIQUE ordering key is deterministic by construction.
# Encoding: exact cents (decimal-cast, <=2dp fixture money) * 1e10 +
# custkey; valid while custkey < 1e10 and |acctbal| < ~9e5 — both hold
# for TPC-H-shaped keys; widen to decimal(38) arithmetic beyond that.
# The oracle states the same semantics in its window form.


def q_top1_per_group_sortfree(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    order_key = (
        (F.col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
        * F.lit(10_000_000_000)
        + F.col("c_custkey")
    )
    top = cust.groupBy("c_nationkey").agg(
        F.max_by("c_acctbal", order_key).alias("top_acctbal"),
        F.max_by("c_custkey", order_key).alias("top_custkey"),
        F.count(F.lit(1)).alias("n_customers"),
    )
    return top.select(
        "c_nationkey", "top_acctbal", "top_custkey", "n_customers"
    )


ORACLE_TOP1_PER_GROUP = """
WITH ranked AS (
  SELECT c_nationkey, c_acctbal, c_custkey,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey DESC) AS rn,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n_customers
  FROM customer
)
SELECT c_nationkey, c_acctbal AS top_acctbal, c_custkey AS top_custkey,
       n_customers
FROM ranked WHERE rn = 1
"""

QUERIES["agg_top1_per_group_sortfree"] = (
    q_top1_per_group_sortfree,
    ORACLE_TOP1_PER_GROUP,
)


# --- TPC-H Q7 shape: volume shipping between two nations -------------------
# The dim-self-join shape the other reports don't exercise: nation joins
# TWICE under different roles (supplier's nation n1, customer's nation
# n2) with a symmetric pair predicate. Supplier and customer are
# scale-growing -> hint-free (the optimizer broadcasts them locally,
# shuffles at 100x); the two nation roles are fixed-cardinality ->
# broadcast-hinted. One lineitem<->orders shuffle is the only fact-fact
# exchange; the year bucket collapses everything to a few rows with
# map-side combine. Exact decimal revenue (dsum_product).

Q7_NATION_A = "NATION_1"
Q7_NATION_B = "NATION_2"


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("n_name").isin(Q7_NATION_A, Q7_NATION_B))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum_product(
                F.col("l_extendedprice"),
                F.lit(1.0) - F.col("l_discount"),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_VOLUME_SHIPPING = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       {oracle_dsum_product('l_extendedprice', '1.0 - l_discount', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND n2.n_name IN ('{Q7_NATION_A}', '{Q7_NATION_B}')
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""

QUERIES["agg_volume_shipping"] = (q_volume_shipping, ORACLE_VOLUME_SHIPPING)


# --- TPC-H Q12 shape: conditional aggregation ------------------------------
# SUM(CASE WHEN ...) pivot-style counting inside one hash aggregate — the
# conditional-aggregation shape the rollup/cube/pivot queries don't
# exercise (pivot generates columns from DATA; this branches on a
# predicate). The fixture lacks l_shipmode/commitdate, so the Q12
# semantics ("how many lineitems of each class came from high- vs
# low-priority orders in a year") keep the classic high/low CASE split
# over o_orderpriority. One fact-fact shuffle join (date-pruned at the
# lineitem scan), then a 3-group map-side-combined aggregate; the CASE
# arms are codegen arithmetic, zero extra passes.

Q12_START = "1996-01-01"
Q12_END = "1997-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_priority_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit(Q12_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q12_END).cast("timestamp"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_PRIORITY_SHIPMENTS = f"""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN {Q12_HIGH} THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN {Q12_HIGH} THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_START}'
  AND l_shipdate < TIMESTAMP '{Q12_END}'
GROUP BY l_returnflag
"""

QUERIES["agg_priority_shipments"] = (
    q_priority_shipments,
    ORACLE_PRIORITY_SHIPMENTS,
)


# --- TPC-H Q17 shape: small-quantity revenue, windowed-AVG rewrite ---------
# "Revenue lost to small orders": lineitems whose quantity is under 20%
# of their part's average quantity. The textbook spelling is a
# correlated AVG subquery per part — Spark plans that as a SECOND full
# lineitem scan + aggregate (same non-materialized-CTE behavior
# sql_min_cost_supplier pins for Q2). The rewrite computes the per-part
# average with AVG() OVER (PARTITION BY l_partkey) on the SAME scan:
# one pass over the fact, one partkey exchange, then a broadcast part
# join for the brand label. The "under 20% of average" predicate is the
# cross-multiplied integer compare 5 * qty * n_part < sum_qty_part
# (quantities are integral in TPC-H-shaped data, runtime-guarded) — no
# double division, so the kept set is deterministic and engine-portable
# (the sample_source_rebalance discipline).

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    qty = F.when(
        F.col("l_quantity") == F.floor("l_quantity"),
        F.col("l_quantity").cast("long"),
    ).otherwise(F.raise_error(F.lit("q17: non-integral l_quantity")))
    w = Window.partitionBy("l_partkey")
    small = (
        li.select("l_partkey", "l_extendedprice", qty.alias("qty"))
        .withColumn("sum_qty", F.sum("qty").over(w))
        .withColumn("n_part", F.count(F.lit(1)).over(w))
        .where(F.col("qty") * 5 * F.col("n_part") < F.col("sum_qty"))
    )
    # hint-free part join: part is scale-growing (the r5 customer-dim
    # discipline) — the optimizer broadcasts below threshold locally and
    # shuffles at 100x
    return (
        small.join(part, small.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum("l_extendedprice", "lost_revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


ORACLE_SMALL_QUANTITY = f"""
WITH q AS (
  SELECT l_partkey, l_extendedprice,
         CAST(l_quantity AS BIGINT) AS qty,
         SUM(CAST(l_quantity AS BIGINT)) OVER (PARTITION BY l_partkey) AS sum_qty,
         COUNT(*) OVER (PARTITION BY l_partkey) AS n_part
  FROM lineitem
)
SELECT p_brand,
       {oracle_dsum('l_extendedprice', 'lost_revenue')},
       COUNT(*) AS n_small
FROM q JOIN part ON l_partkey = p_partkey
WHERE qty * 5 * n_part < sum_qty
GROUP BY p_brand
"""

QUERIES["agg_small_quantity_revenue"] = (
    q_small_quantity_revenue,
    ORACLE_SMALL_QUANTITY,
)


# --- TPC-H Q15 shape: top supplier(s) by period revenue --------------------
# Global argmax WITH ties over an aggregate. The textbook view+scalar-max
# spelling references the revenue aggregate twice — un-materialized,
# that's two full lineitem scans. Here the (small) per-supplier aggregate
# is computed once and lineage-truncated (localCheckpoint — the
# post-aggregation table is |suppliers| rows, never the fact), then the
# 1-row MAX broadcasts back over it: one lineitem scan, one suppkey
# exchange, and NO single-partition global window (a rank() spelling
# would funnel every supplier row through one task at 100 TB). Revenue
# compares in exact integer centi-cents (price 2dp x discount 2dp), so
# the tie set is deterministic — fround only renders the report column.

Q15_START = "1996-01-01"
Q15_END = "1996-04-01"


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.exact import fround

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    price_c = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    disc_c = F.lit(100) - F.round(F.col("l_discount") * 100, 0).cast("long")
    revs = (
        li.where(
            (F.col("l_shipdate") >= F.lit(Q15_START))
            & (F.col("l_shipdate") < F.lit(Q15_END))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(price_c * disc_c).alias("revenue_cc"))
        .localCheckpoint()
    )
    best = revs.agg(F.max("revenue_cc").alias("max_cc"))
    # the 1-row max broadcasts by construction; the supplier join is
    # hint-free — supplier is scale-growing, and the probe side (the tie
    # set) is the naturally tiny side for AQE to broadcast
    return (
        revs.join(F.broadcast(best), F.col("revenue_cc") == F.col("max_cc"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            fround(F.col("revenue_cc") / 10000.0, 2).alias("total_revenue"),
        )
    )


ORACLE_TOP_SUPPLIER = f"""
WITH revs AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100, 0) AS BIGINT)))
           AS revenue_cc
  FROM lineitem
  WHERE l_shipdate >= '{Q15_START}' AND l_shipdate < '{Q15_END}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       floor(revenue_cc / 10000.0 * 100 + 0.5) / 100 AS total_revenue
FROM revs JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue_cc = (SELECT MAX(revenue_cc) FROM revs)
"""

QUERIES["agg_top_supplier_revenue"] = (
    q_top_supplier_revenue,
    ORACLE_TOP_SUPPLIER,
)


# --- TPC-H Q13 shape: customer order-count distribution --------------------
# The zero-group subtlety none of the other aggregates exercise: the
# distribution must include customers with NO qualifying orders (the
# c_count = 0 bucket), which an inner join silently drops. Orders
# aggregate per customer FIRST (one custkey exchange with map-side
# combine, priority filter pushed to the scan), then customer left-joins
# the counts — customer and orders are both scale-growing, so the join
# is hint-free (AQE broadcasts the small side locally, shuffles at
# 100x). The final distribution is a few-row aggregate.

Q13_PRIORITY = "1-URGENT"  # rare enough that zero-order customers exist


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    per_cust = (
        orders.where(F.col("o_orderpriority") == Q13_PRIORITY)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORACLE_ORDER_COUNT_DISTRIBUTION = f"""
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS c_count
  FROM orders
  WHERE o_orderpriority = '{Q13_PRIORITY}'
  GROUP BY o_custkey
)
SELECT COALESCE(c_count, 0) AS c_count,
       COUNT(*) AS n_customers
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY 1
"""

QUERIES["agg_order_count_distribution"] = (
    q_order_count_distribution,
    ORACLE_ORDER_COUNT_DISTRIBUTION,
)


# --- TPC-H Q19 shape: disjunctive cross-table predicate --------------------
# OR-of-conjunctions mixing part and lineitem columns. Catalyst cannot
# push a cross-table OR below the join, so the textbook spelling scans
# BOTH tables in full and evaluates the whole disjunction post-join. The
# classic fix (what a 100 TB run needs) is deriving the IMPLIED
# single-table predicates by hand — the union of each leg's bounds,
# computed FROM Q19_LEGS (with the current legs: l_quantity in [1, 50]
# prunes the fact scan; brand IN (3 of 25 brands) AND size in [1, 50]
# shrinks the part side) — while the exact disjunction still filters
# post-join. Both pushdowns are plan-pinned (PushedFilters on each
# scan); the join is hint-free. Exact decimal revenue.

Q19_LEGS = (  # (brand, max_size, qty_lo, qty_hi)
    ("Brand#12", 30, 1, 20),
    ("Brand#23", 40, 10, 35),
    ("Brand#34", 50, 20, 50),
)


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    qty_lo = min(lo for _, _, lo, _ in Q19_LEGS)
    qty_hi = max(hi for _, _, _, hi in Q19_LEGS)
    size_hi = max(s for _, s, _, _ in Q19_LEGS)
    brands = [b for b, _, _, _ in Q19_LEGS]
    # implied single-table prunes (the union of the legs' bounds)
    li = li.where(F.col("l_quantity").between(qty_lo, qty_hi))
    part = part.where(
        F.col("p_brand").isin(*brands)
        & F.col("p_size").between(1, size_hi)
    )
    leg = None
    for brand, size, lo, hi in Q19_LEGS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size)
            & F.col("l_quantity").between(lo, hi)
        )
        leg = c if leg is None else (leg | c)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(leg)
        .agg(
            dsum_product(
                F.col("l_extendedprice"),
                F.lit(1.0) - F.col("l_discount"),
                "revenue",
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _oracle_disjunctive_revenue() -> str:
    legs = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s} "
        f"AND l_quantity BETWEEN {lo} AND {hi})"
        for b, s, lo, hi in Q19_LEGS
    )
    return f"""
SELECT {oracle_dsum_product('l_extendedprice', '1.0 - l_discount', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {legs}
"""


QUERIES["agg_disjunctive_revenue"] = (
    q_disjunctive_revenue,
    _oracle_disjunctive_revenue(),
)
