"""Window-function operator family (SURVEY §2.7) + batch analogs of the
streaming time-window aggregations (SURVEY T7).

The reference has no Window usage; its serving layout implies "latest per
key, time-descending" (cassandra-setup.cql:23 clustering DESC; Redis
last-write-wins, stream-processor.py:101-111). This module covers ranking
(row_number/rank/dense_rank), analytic (lag/lead), frame specs (running
aggregates), keyed latest-wins dedup (the idempotent-sink semantics of K3),
gap-based sessionization, and tumbling event-time buckets.

Scale notes: every window partitions by a key (user/customer) — one shuffle
on that key, then sorted within partitions; no global sort anywhere.
Time deltas use integer microseconds (exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dsum, fround, oracle_dsum, oracle_fround
from ..sources.tables import load_table


# --- K3 semantics: keyed latest-wins dedup (idempotent upsert view) -------
def latest_wins(df: DataFrame, key: str, order: list) -> DataFrame:
    w = Window.partitionBy(key).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")


def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_wins(
        ev, "user_id", [F.desc("ts"), F.desc("event_id")]
    ).select("user_id", "event_id", "ts", "event_type", "value")


ORACLE_LATEST_PER_USER = """
SELECT user_id, event_id, ts, event_type, value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


# --- ranking: top-3 orders per customer by price --------------------------
def q_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


ORACLE_RANK_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
FROM orders
QUALIFY rk <= 3
"""


# --- analytic: lag/lead inter-event gaps (integer microseconds) -----------
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros(F.col("ts"))
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (us - F.lag(us).over(w)).alias("gap_us"),
        (F.lead(us).over(w) - us).alias("next_gap_us"),
    )


ORACLE_EVENT_GAPS = """
SELECT user_id, event_id, ts,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
       LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS next_gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


# --- frame spec: running revenue per customer over order dates ------------
def q_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(27,6)")).over(w), 2)
        .cast("double")
        .alias("running_spend"),
    )


ORACLE_RUNNING_SPEND = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(27,6))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
       AS running_spend
FROM orders
"""


# --- gap-based sessionization (batch analog of session_window) ------------
# New session when >30 min idle; lag + cumulative flag-sum — the classic
# SQL-expressible sessionizer, one shuffle on user_id.
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        dsum("value", "session_value"),
    )


ORACLE_SESSIONIZE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 30*60*1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, SUM(new_sess) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id_raw
  FROM flagged
)
SELECT user_id, CAST(session_id_raw AS BIGINT) AS session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       {oracle_dsum('value', 'session_value')}
FROM sess
GROUP BY user_id, session_id_raw
"""


# --- tumbling event-time buckets (batch analog of window(ts,'1 hour')) ----
def q_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


ORACLE_TUMBLING_HOUR = f"""
SELECT date_trunc('hour', ts) AS bucket_start, event_type,
       COUNT(*) AS n, {oracle_dsum('value', 'sum_value')}
FROM events
GROUP BY 1, 2
"""


# --- full ranking/analytic family over one window ------------------------
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("o_orderkey").over(frame).alias("best_order"),
        F.last("o_orderkey").over(frame).alias("worst_order"),
    )


ORACLE_RANK_FAMILY = """
SELECT o_custkey, o_orderkey,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       FIRST_VALUE(o_orderkey) OVER wf AS best_order,
       LAST_VALUE(o_orderkey) OVER wf AS worst_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
       wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- sliding event-time buckets (batch analog of window(ts,'1h','30m')) ---
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
        .select(F.col("w.start").alias("bucket_start"), "n", "sum_value")
    )


ORACLE_SLIDING_WINDOW = f"""
WITH b AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS bucket_start, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
  FROM events
)
SELECT bucket_start, COUNT(*) AS n, {oracle_dsum('value', 'sum_value')}
FROM b GROUP BY bucket_start
"""


# --- funnel / drop-off analysis -------------------------------------------
# The reference's stated purpose is engagement analytics with "drop-off
# detection" (README.md:8-12); this is that query. Ordered funnel
# signup -> first click after signup -> first purchase after that click,
# computed with three chained min-over-user windows in ONE shuffle (all
# windows share the user_id partitioning; Catalyst plans a single
# Exchange), then a tiny stage-count aggregation.


def q_funnel_dropoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    s = F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w)
    with_s = ev.withColumn("s_ts", s)
    c = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("s_ts")),
            F.col("ts"),
        )
    ).over(w)
    with_c = with_s.withColumn("c_ts", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")),
            F.col("ts"),
        )
    ).over(w)
    staged = (
        with_c.withColumn("p_ts", p)
        .groupBy("user_id")
        .agg(
            F.max("s_ts").alias("s_ts"),
            F.max("c_ts").alias("c_ts"),
            F.max("p_ts").alias("p_ts"),
        )
        .select(
            F.when(F.col("p_ts").isNotNull(), "purchase")
            .when(F.col("c_ts").isNotNull(), "click")
            .when(F.col("s_ts").isNotNull(), "signup")
            .otherwise("none")
            .alias("stage_reached")
        )
    )
    return staged.groupBy("stage_reached").agg(
        F.count(F.lit(1)).alias("n_users")
    )


ORACLE_FUNNEL_DROPOFF = """
WITH s1 AS (
  SELECT user_id, ts, event_type,
         MIN(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id) AS s_ts
  FROM events
), s2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > s_ts THEN ts END)
              OVER (PARTITION BY user_id) AS c_ts
  FROM s1
), s3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
              OVER (PARTITION BY user_id) AS p_ts
  FROM s2
), staged AS (
  SELECT user_id,
         CASE WHEN MAX(p_ts) IS NOT NULL THEN 'purchase'
              WHEN MAX(c_ts) IS NOT NULL THEN 'click'
              WHEN MAX(s_ts) IS NOT NULL THEN 'signup'
              ELSE 'none' END AS stage_reached
  FROM s3 GROUP BY user_id
)
SELECT stage_reached, COUNT(*) AS n_users
FROM staged GROUP BY stage_reached
"""


QUERIES = {
    "win_latest_per_user": (q_latest_per_user, ORACLE_LATEST_PER_USER),
    "win_funnel_dropoff": (q_funnel_dropoff, ORACLE_FUNNEL_DROPOFF),
    "win_rank_family": (q_rank_family, ORACLE_RANK_FAMILY),
    "win_sliding_window": (q_sliding_window, ORACLE_SLIDING_WINDOW),
    "win_rank_orders": (q_rank_orders, ORACLE_RANK_ORDERS),
    "win_event_gaps": (q_event_gaps, ORACLE_EVENT_GAPS),
    "win_running_spend": (q_running_spend, ORACLE_RUNNING_SPEND),
    "win_sessionize": (q_sessionize, ORACLE_SESSIONIZE),
    "win_tumbling_hour": (q_tumbling_hour, ORACLE_TUMBLING_HOUR),
}


# --- distribution family: percent_rank / cume_dist / ntile ----------------
# (ntile needs a TOTAL order to be deterministic: ties on o_totalprice are
# broken by o_orderkey in both engines.)


def q_distribution_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        fround(F.percent_rank().over(w), 8).alias("pct_rank"),
        fround(F.cume_dist().over(w), 8).alias("cume"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


_PR = oracle_fround("percent_rank() OVER w", 8)
_CD = oracle_fround("cume_dist() OVER w", 8)

ORACLE_DISTRIBUTION_FAMILY = f"""
SELECT o_orderkey, o_orderstatus, o_totalprice,
       {_PR} AS pct_rank,
       {_CD} AS cume,
       CAST(ntile(10) OVER w AS BIGINT) AS decile
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""

QUERIES["win_distribution_family"] = (
    q_distribution_family,
    ORACLE_DISTRIBUTION_FAMILY,
)
