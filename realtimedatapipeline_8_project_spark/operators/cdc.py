"""Snapshot-diff / CDC classification (SURVEY §1.1 outbox-CDC semantics,
generalized: the reference's outbox relay ships row-level changes —
source-layer/setup.sql:25-51, ingestion-layer/utils/utils.py:107-134 —
and this operator answers the reverse question: given two materialized
states, WHAT changed).

``snapshot_diff_cdc`` compares each user's aggregate engagement state in
two adjacent windows (week 2 vs week 3 of the fixture month) and emits
one row per user classified as ``insert`` (appears only in the new
state), ``delete`` (only in the old), ``update`` (in both, metrics
moved) or ``unchanged`` — the change-data feed a downstream incremental
consumer (or an outbox writer) would publish.

Scale notes: each snapshot is a partial-combined aggregate keyed by
user; the diff is ONE full-outer merge join on the same key — at 100 TB
both sides arrive hash-partitioned by user_id, so AQE plans a co-located
join and nothing but (user_id, counters) ever shuffles. Exact decimal
sums keep the 'update vs unchanged' comparison bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dsum, oracle_dsum
from ..sources.tables import load_table

OLD_START, CUT, NEW_END = "2024-01-08", "2024-01-15", "2024-01-22"


def _state(ev: DataFrame, lo: str, hi: str) -> DataFrame:
    return (
        ev.where((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value", "total"))
    )


def q_snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    old = _state(ev, OLD_START, CUT).select(
        "user_id", F.col("n").alias("old_n"), F.col("total").alias("old_total")
    )
    new = _state(ev, CUT, NEW_END).select(
        "user_id", F.col("n").alias("new_n"), F.col("total").alias("new_total")
    )
    merged = old.join(new, "user_id", "full_outer")
    change = (
        F.when(F.col("old_n").isNull(), F.lit("insert"))
        .when(F.col("new_n").isNull(), F.lit("delete"))
        .when(
            (F.col("old_n") != F.col("new_n"))
            | (F.col("old_total") != F.col("new_total")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return merged.select(
        "user_id", change.alias("change_type"), "old_n", "new_n",
        "old_total", "new_total",
    )


ORACLE_SNAPSHOT_DIFF = f"""
WITH old AS (
  SELECT user_id, COUNT(*) AS old_n, {oracle_dsum('value', 'old_total')}
  FROM events
  WHERE ts >= TIMESTAMP '{OLD_START}' AND ts < TIMESTAMP '{CUT}'
  GROUP BY user_id
), new AS (
  SELECT user_id, COUNT(*) AS new_n, {oracle_dsum('value', 'new_total')}
  FROM events
  WHERE ts >= TIMESTAMP '{CUT}' AND ts < TIMESTAMP '{NEW_END}'
  GROUP BY user_id
)
SELECT COALESCE(o.user_id, n.user_id) AS user_id,
       CASE WHEN o.old_n IS NULL THEN 'insert'
            WHEN n.new_n IS NULL THEN 'delete'
            WHEN o.old_n <> n.new_n OR o.old_total <> n.new_total
              THEN 'update'
            ELSE 'unchanged' END AS change_type,
       o.old_n, n.new_n, o.old_total, n.new_total
FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
"""


QUERIES = {
    "snapshot_diff_cdc": (q_snapshot_diff_cdc, ORACLE_SNAPSHOT_DIFF),
}


# --- MERGE INTO (apply a change feed to a base state) ---------------------
# Spark's native answer to MERGE without a table format: untouched base
# rows survive via an anti-join against the touched key set; inserts and
# updates arrive via union. tests/test_cdc.py proves the algebra:
# merge(old_state, diff(old, new)) == new_state exactly.
# Scale: both sides are keyed by user_id; the anti-join ships only the
# touched-key set (broadcast when it fits), the union is shuffle-free.


def q_merge_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    base = _state(ev, OLD_START, CUT)
    changes = q_snapshot_diff_cdc(spark, sf_dir)
    touched = changes.where(F.col("change_type") != "unchanged").select(
        "user_id", "change_type", "new_n", "new_total"
    )
    kept = base.join(touched, "user_id", "left_anti")
    upserts = touched.where(F.col("change_type") != "delete").select(
        "user_id",
        F.col("new_n").alias("n"),
        F.col("new_total").alias("total"),
    )
    return kept.unionByName(upserts)


ORACLE_MERGE_APPLY = f"""
WITH base AS (
  SELECT user_id, COUNT(*) AS n, {oracle_dsum('value', 'total')}
  FROM events
  WHERE ts >= TIMESTAMP '{OLD_START}' AND ts < TIMESTAMP '{CUT}'
  GROUP BY user_id
), changes AS ({ORACLE_SNAPSHOT_DIFF}),
touched AS (
  SELECT user_id, change_type, new_n, new_total FROM changes
  WHERE change_type <> 'unchanged'
)
SELECT b.user_id, b.n, b.total
FROM base b
WHERE NOT EXISTS (SELECT 1 FROM touched t WHERE t.user_id = b.user_id)
UNION ALL
SELECT user_id, new_n AS n, new_total AS total
FROM touched WHERE change_type <> 'delete'
"""

QUERIES["merge_apply_changes"] = (q_merge_apply_changes, ORACLE_MERGE_APPLY)
