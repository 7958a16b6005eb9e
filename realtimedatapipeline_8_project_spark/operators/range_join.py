"""Range (interval-containment) join, bucketed for scale.

"Which session interval does each event fall into?" A naive theta join
(e.percent BETWEEN s.start AND s.end) forces Spark into
BroadcastNestedLoopJoin — O(n*m) comparisons. The scalable form buckets
time: explode each interval into the fixed-width buckets it overlaps, join
events to intervals on the *equi* bucket key, then apply the exact
containment predicate. Each comparison now happens only within a bucket —
an equi-join Catalyst shuffles/broadcasts like any other, with cost
O(events + intervals * avg_buckets_per_interval).

The DuckDB oracle is the plain inequality join, proving the bucketed plan
loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

BUCKET = "1 hour"
BUCKET_US = 3_600 * 1_000_000


def bucketed_range_join(
    left: DataFrame,
    left_ts: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    extra_keys: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Equi-join on (time bucket [+ extra keys]) + exact containment filter.

    ``intervals`` end bound is inclusive; both frames keep all their
    columns (names must not collide). ``extra_keys`` [(left_col,
    right_col), ...] tightens the equi side — e.g. joining per-user
    intervals on (bucket, user) keeps bucket collisions across users from
    ever materializing."""
    lb = left.withColumn(
        "_bucket", (F.unix_micros(F.col(left_ts)) / BUCKET_US).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col)) / BUCKET_US).cast("long"),
                (F.unix_micros(F.col(end_col)) / BUCKET_US).cast("long"),
            )
        ),
    )
    cond = lb["_bucket"] == ib["_bucket"]
    for lk, rk in extra_keys or []:
        cond = cond & (lb[lk] == ib[rk])
    return (
        lb.join(ib, cond)
        .drop(ib["_bucket"])
        .where(
            (F.col(left_ts) >= F.col(start_col))
            & (F.col(left_ts) <= F.col(end_col))
        )
        .drop("_bucket")
    )


def q_range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attach each click/error event to the purchase-to-purchase interval
    of the same user it falls into (a self-derived interval table), via the
    bucketed range join. Oracle = plain inequality join."""
    ev = load_table(spark, sf_dir, "events")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("start_ts"),
        )
        .withColumn(
            "end_ts",
            F.lead("start_ts").over(
                Window.partitionBy("p_user").orderBy(F.asc("start_ts"), F.asc("interval_id"))
            ),
        )
        .where(F.col("end_ts").isNotNull())
    )
    clicks = ev.where(F.col("event_type").isin("click", "error")).select(
        "event_id", "user_id", "ts"
    )
    joined = bucketed_range_join(
        clicks, "ts", purchases, "start_ts", "end_ts",
        extra_keys=[("user_id", "p_user")],
    )
    return (
        joined.select("event_id", "user_id", "ts", "interval_id")
        # an event at an interval boundary belongs to both (inclusive ends);
        # keep the earliest interval deterministically
        .groupBy("event_id", "user_id", "ts")
        .agg(F.min("interval_id").alias("interval_id"))
    )


ORACLE_RANGE_JOIN = """
WITH purchases AS (
  SELECT user_id AS p_user, event_id AS interval_id, ts AS start_ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS end_ts
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type IN ('click', 'error')
)
SELECT c.event_id, c.user_id, c.ts, MIN(p.interval_id) AS interval_id
FROM clicks c
JOIN purchases p
  ON c.user_id = p.p_user
 AND p.end_ts IS NOT NULL
 AND c.ts >= p.start_ts AND c.ts <= p.end_ts
GROUP BY c.event_id, c.user_id, c.ts
"""

QUERIES = {
    "range_join_bucketed": (q_range_join_sessions, ORACLE_RANGE_JOIN),
}
