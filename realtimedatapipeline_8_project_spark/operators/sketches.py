"""Sketch structures + time-hierarchy rollups (SURVEY §2.6/§2.13 scale
extensions: "hypertable rollup, a novel sketch").

* ``hypertable_rollup`` — one pass, multi-resolution continuous-aggregate
  table (hour / day / full-range rows distinguished by GROUPING ID), the
  batch analog of TimescaleDB-style hierarchical caggs. Spark computes
  every resolution in a single shuffle via GROUPING SETS; serving reads
  filter on ``resolution`` (partition-prunable if materialized
  partitionBy("resolution")).
* ``count_min_sketch`` — the classic streaming frequency sketch built as
  a DataFrame: d hash rows per key (Knuth multiplicative family, exact
  integer arithmetic — portable to the oracle), groupBy (depth, slot)
  with map-side combine. The sketch table is W*D counters regardless of
  corpus size; point estimates = min over d counters. The build is ONE
  aggregation over the fact table — no per-key state.

Both are exact-arithmetic DataFrame programs with full DuckDB oracles
(the estimate query also demonstrates the sketch's overcount guarantee:
estimate >= true count, checked in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

# --- hypertable rollup -----------------------------------------------------


def q_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    day = F.date_trunc("day", F.col("ts"))
    with_buckets = ev.select(
        hour.alias("bucket_hour"), day.alias("bucket_day"), "event_type", "value"
    )
    with_buckets.createOrReplaceTempView("_ht_events")
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(bucket_hour) = 0 THEN 'hour'
                    WHEN GROUPING(bucket_day) = 0 THEN 'day'
                    ELSE 'all' END AS resolution,
               COALESCE(bucket_hour, bucket_day) AS bucket_start,
               event_type,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 6) AS DOUBLE)
                 AS sum_value
        FROM _ht_events
        GROUP BY GROUPING SETS (
          (bucket_hour, event_type),
          (bucket_day, event_type),
          (event_type)
        )
        """
    )


ORACLE_HYPERTABLE_ROLLUP = """
WITH e AS (
  SELECT date_trunc('hour', ts) AS bucket_hour,
         date_trunc('day', ts) AS bucket_day,
         event_type, value
  FROM events
)
SELECT CASE WHEN GROUPING(bucket_hour) = 0 THEN 'hour'
            WHEN GROUPING(bucket_day) = 0 THEN 'day'
            ELSE 'all' END AS resolution,
       COALESCE(bucket_hour, bucket_day) AS bucket_start,
       event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))), 6) AS DOUBLE) AS sum_value
FROM e
GROUP BY GROUPING SETS (
  (bucket_hour, event_type),
  (bucket_day, event_type),
  (event_type)
)
"""

# --- count-min sketch ------------------------------------------------------

CM_WIDTH = 2048
CM_DEPTH = 4
# Odd multipliers (distinct per depth) for the multiplicative hash family.
CM_SALTS = (2_654_435_761, 2_246_822_519, 3_266_489_917, 668_265_263)
CM_MOD = 2**32


def _cm_slot(key_col, depth: int):
    """Deterministic slot for a non-negative integer key at one depth.
    key*salt stays below 2^63 for keys < ~2^31 (user ids here)."""
    return (key_col * F.lit(CM_SALTS[depth])) % F.lit(CM_MOD) % F.lit(CM_WIDTH)


def q_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the W x D counter table over event user_ids: explode each row
    into its d (depth, slot) cells, one map-side-combined aggregation."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cm_slot(F.col("user_id"), d).alias("slot"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("c")
    ).select("c.depth", "c.slot")
    return cells.groupBy("depth", "slot").agg(F.count(F.lit(1)).alias("n"))


def _oracle_cm_slot(key_sql: str, depth: int) -> str:
    return f"({key_sql} * {CM_SALTS[depth]} % {CM_MOD} % {CM_WIDTH})"


ORACLE_COUNT_MIN_SKETCH = f"""
WITH cells AS (
  {" UNION ALL ".join(
    f"SELECT {d} AS depth, {_oracle_cm_slot('user_id', d)} AS slot FROM events"
    for d in range(CM_DEPTH)
  )}
)
SELECT depth, slot, COUNT(*) AS n FROM cells GROUP BY depth, slot
"""


def q_count_min_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-estimate per-user event counts from the sketch (min over the
    d counters) joined against true counts — the overcount guarantee
    (estimate >= true) is visible in the result and pinned by a test."""
    sketch = q_count_min_sketch(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_n"))
    probes = users.select(
        "user_id",
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _cm_slot(F.col("user_id"), d).alias("slot"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("user_id", "true_n", "c.depth", "c.slot")
    return (
        probes.join(F.broadcast(sketch), ["depth", "slot"])
        .groupBy("user_id", "true_n")
        .agg(F.min("n").alias("estimate"))
    )


ORACLE_COUNT_MIN_ESTIMATE = f"""
WITH cells AS (
  {" UNION ALL ".join(
    f"SELECT {d} AS depth, {_oracle_cm_slot('user_id', d)} AS slot FROM events"
    for d in range(CM_DEPTH)
  )}
), sketch AS (
  SELECT depth, slot, COUNT(*) AS n FROM cells GROUP BY depth, slot
), users AS (
  SELECT user_id, COUNT(*) AS true_n FROM events GROUP BY user_id
), probes AS (
  {" UNION ALL ".join(
    f"SELECT user_id, true_n, {d} AS depth, "
    f"{_oracle_cm_slot('user_id', d)} AS slot FROM users"
    for d in range(CM_DEPTH)
  )}
)
SELECT p.user_id, p.true_n, MIN(s.n) AS estimate
FROM probes p JOIN sketch s USING (depth, slot)
GROUP BY p.user_id, p.true_n
"""


QUERIES = {
    "hypertable_rollup": (q_hypertable_rollup, ORACLE_HYPERTABLE_ROLLUP),
    "sketch_count_min": (q_count_min_sketch, ORACLE_COUNT_MIN_SKETCH),
    "sketch_count_min_estimate": (q_count_min_estimate, ORACLE_COUNT_MIN_ESTIMATE),
}
