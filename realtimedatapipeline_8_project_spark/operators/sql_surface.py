"""SQL-API surface (SURVEY E3): the engine's queries are equally
expressible through ``spark.sql`` — these operators register the fixture
views and run ANSI SQL through Catalyst, covering constructs that are
SQL-first: GROUPING SETS, scalar subqueries, IN-subqueries, PIVOT, and
LATERAL-style explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views


# --- GROUPING SETS (beyond rollup/cube) -----------------------------------
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(27,6))), 2) AS DOUBLE)
                 AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(27,6))), 2) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


# --- scalar subquery (Catalyst decorrelation) -----------------------------
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT CAST(ROUND(SUM(CAST(o_totalprice AS
            DECIMAL(27,6))), 2) AS DOUBLE) / COUNT(*) FROM orders)
        """
    )


ORACLE_SCALAR_SUBQUERY = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 1.5 * (SELECT CAST(ROUND(SUM(CAST(o_totalprice AS
    DECIMAL(27,6))), 2) AS DOUBLE) / COUNT(*) FROM orders)
"""


# --- IN-subquery ----------------------------------------------------------
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ) AND o_orderstatus = 'O'
        """
    )


ORACLE_IN_SUBQUERY = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
) AND o_orderstatus = 'O'
"""


# --- pivot (wide per-key event-type counts, the serving dashboard shape) --
def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    kinds = ["signup", "click", "error", "view", "purchase"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


ORACLE_PIVOT_EVENT_TYPES = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'error') AS error,
       COUNT(*) FILTER (event_type = 'view') AS view,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase
FROM events
GROUP BY user_id
"""


# --- ordered array aggregation (collect_list with deterministic order) ----
def q_event_history_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user chronological event-type history — collect_list is
    unordered by contract, so the deterministic form sorts structs of
    (ts, event_id, type) and projects. The serving shape for 'recent
    activity' feeds. Emitted '>'-joined (not as a raw array): the driver
    comparator requires scalar cells (tests/test_output_shapes.py)."""
    ev = load_table(spark, sf_dir, "events")
    hist = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ),
            lambda s: s["event_type"],
        ),
        ">",
    )
    return ev.groupBy("user_id").agg(
        hist.alias("history"), F.count(F.lit(1)).alias("n")
    )


ORACLE_EVENT_HISTORY = """
SELECT user_id,
       array_to_string(list(event_type ORDER BY ts, event_id), '>') AS history,
       COUNT(*) AS n
FROM events
GROUP BY user_id
"""


# --- explode / lateral: token frequency over documents --------------------
def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(20)
    )


ORACLE_TOP_TOKENS = """
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents)
GROUP BY token
ORDER BY freq DESC, token ASC
LIMIT 20
"""


QUERIES = {
    "sql_grouping_sets": (q_grouping_sets, ORACLE_GROUPING_SETS),
    "sql_scalar_subquery": (q_scalar_subquery, ORACLE_SCALAR_SUBQUERY),
    "sql_in_subquery": (q_in_subquery, ORACLE_IN_SUBQUERY),
    "pivot_event_types": (q_pivot_event_types, ORACLE_PIVOT_EVENT_TYPES),
    "array_event_history": (q_event_history_arrays, ORACLE_EVENT_HISTORY),
    "explode_top_tokens": (q_top_tokens, ORACLE_TOP_TOKENS),
}


# --- correlated EXISTS with a non-equi correlated predicate ---------------
# Catalyst must decorrelate the inequality-correlated subquery into a
# join; DuckDB's unnesting does the same — the query planner workout the
# simple IN-subquery above doesn't exercise.


def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 40 * c.c_acctbal
        )
        """
    )


ORACLE_EXISTS_CORRELATED = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_totalprice > 40 * c.c_acctbal
)
"""

QUERIES["sql_exists_correlated"] = (q_exists_correlated, ORACLE_EXISTS_CORRELATED)


# --- correlated LATERAL subquery with ORDER BY/LIMIT ----------------------
# Top-k-per-group spelled the SQL-first way: a correlated lateral derived
# table with its own ORDER BY ... LIMIT. Catalyst plans this via lateral
# join decorrelation (the DataFrame twin is the window row_number <= k of
# agg_top1_per_group_sortfree / win_rank_family); the identical string
# runs on DuckDB. Deterministic under ties via the c_custkey tie-break.

SQL_LATERAL_TOPK = """
SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_name, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) t
"""


def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(SQL_LATERAL_TOPK)


QUERIES["sql_lateral_topk"] = (q_lateral_topk, SQL_LATERAL_TOPK)


# --- TPC-H Q2 shape: min-cost supplier per part ---------------------------
# The fixture has no partsupp table, so supply cost is derived from
# observed trade: per (part, supplier), the best truncated-cent unit
# price across that pair's lineitems; the report keeps, for each
# small-size part, exactly the supplier(s) achieving the part's global
# minimum. Q2's textbook spelling is a correlated MIN subquery over the
# cost CTE — but Spark plans the CTE's second reference as a SECOND full
# lineitem scan+aggregate (no CTE materialization; verified with
# .explain), which at 100 TB doubles the fact I/O. The windowed-MIN
# rewrite below is the classic optimization: ONE lineitem scan, then
# MIN() OVER (PARTITION BY part) on the already-aggregated (part,
# supplier) cost table — per-part min and the equality filter in a
# single pass over the small side. Correlated-subquery *surface*
# coverage lives in sql_scalar_subquery / sql_exists_correlated /
# sql_lateral_topk; this query pins the plan you'd actually run. The
# identical string executes on DuckDB (only integer division is
# dialect-split: DIV vs //).
#
# Unit cost stays in exact integer cents (price has 2 dp, quantity is
# integral and > 0 in TPC-H-shaped data; ROUND(x*100) is exact for money
# < 2^49), truncated via integer division — so the min-equality compare
# is deterministic in both engines, with no float-tie hazard.

_Q2_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) {div}
             CAST(l_quantity AS BIGINT)) AS unit_cost_c
  FROM lineitem
  WHERE l_quantity > 0
  GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey, l_suppkey, unit_cost_c,
         MIN(unit_cost_c) OVER (PARTITION BY l_partkey) AS part_min_c
  FROM cost
)
SELECT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name, b.unit_cost_c
FROM part p
JOIN best b ON b.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = b.l_suppkey
WHERE p.p_size <= 10
  AND b.unit_cost_c = b.part_min_c
"""


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL.format(div="DIV"))


ORACLE_MIN_COST_SUPPLIER = _Q2_SQL.format(div="//")

QUERIES["sql_min_cost_supplier"] = (
    q_min_cost_supplier,
    ORACLE_MIN_COST_SUPPLIER,
)
