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

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

BUCKET_US = 3_600 * 1_000_000  # fallback width when intervals are empty
MIN_BUCKET_US = 60 * 1_000_000
MAX_BUCKET_US = 30 * 24 * 3_600 * 1_000_000


def _estimate_bucket_us(
    intervals: DataFrame, start_col: str, end_col: str
) -> int:
    """Pick the bucket width from data: ~the mean interval length.

    Bucketing cost is (explode factor = len/bucket + 1) on the interval
    side vs (rows co-bucketed = bucket density) on the probe side; width ≈
    mean interval length caps the explode factor at ~2 while keeping
    buckets tight. One column-pruned scan of two timestamp columns — at
    100 TB this is the same trick AQE uses (tiny stats pass to shape the
    expensive plan). Clamped to [1 min, 30 days]."""
    avg = intervals.agg(
        F.avg(
            F.unix_micros(F.col(end_col)) - F.unix_micros(F.col(start_col))
        ).alias("avg_us")
    ).first()["avg_us"]
    if avg is None:
        return BUCKET_US
    return max(MIN_BUCKET_US, min(int(avg), MAX_BUCKET_US))


def bucketed_range_join(
    left: DataFrame,
    left_ts: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    extra_keys: list[tuple[str, str]] | None = None,
    bucket_us: int | None = None,
) -> DataFrame:
    """Equi-join on (time bucket [+ extra keys]) + exact containment filter.

    ``intervals`` end bound is inclusive; both frames keep all their
    columns (names must not collide). ``extra_keys`` [(left_col,
    right_col), ...] tightens the equi side — e.g. joining per-user
    intervals on (bucket, user) keeps bucket collisions across users from
    ever materializing. ``bucket_us`` defaults to a data-derived estimate
    (mean interval length)."""
    if bucket_us is None:
        bucket_us = _estimate_bucket_us(intervals, start_col, end_col)
    lb = left.withColumn(
        "_bucket", (F.unix_micros(F.col(left_ts)) / bucket_us).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col)) / bucket_us).cast("long"),
                (F.unix_micros(F.col(end_col)) / bucket_us).cast("long"),
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
        # read twice: once by the bucket-width stats pass, once by the join;
        # MEMORY_AND_DISK so a 100 TB interval table spills instead of
        # evicting and recomputing the scan
        .persist(StorageLevel.MEMORY_AND_DISK)
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

# --- interval-vs-interval overlap join, via bucket cover ------------------
# "How many user sessions overlap each 6-hour wall-clock window?" The
# interval-interval analog of the containment join above: a session
# [start, end] overlaps window [w, w+6h) iff floor6h(start) <= w <=
# floor6h(end), so exploding each session into the 6h buckets it covers
# and counting per bucket IS the overlap join — no grid table, no
# inequality predicate, one narrow shuffle of (bucket) keys. Explode
# factor = session length / 6h + 1 (~1 for 30-min-gap sessions). The
# oracle proves the equivalence by running the literal inequality overlap
# join against a generate_series grid.
OVERLAP_WINDOW_US = 6 * 3_600 * 1_000_000


def q_interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .windows import q_sessionize

    w = OVERLAP_WINDOW_US
    sess = q_sessionize(spark, sf_dir)
    return (
        sess.select(
            F.explode(
                F.sequence(
                    F.expr(f"unix_micros(session_start) div {w}"),
                    F.expr(f"unix_micros(session_end) div {w}"),
                )
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .select(
            F.timestamp_micros(F.col("bucket") * w).alias("window_start"),
            F.col("n_sessions").cast("long").alias("n_sessions"),
        )
    )


def _oracle_interval_overlap() -> str:
    from .windows import ORACLE_SESSIONIZE

    w = OVERLAP_WINDOW_US
    return f"""
WITH sess AS (SELECT * FROM ({ORACLE_SESSIONIZE}) t),
bounds AS (
  SELECT epoch_us(MIN(session_start)) // {w} AS lob,
         epoch_us(MAX(session_end)) // {w} AS hib
  FROM sess
), grid AS (
  SELECT UNNEST(generate_series(lob, hib)) AS bucket FROM bounds
)
SELECT make_timestamp(g.bucket * {w}) AS window_start,
       COUNT(*) AS n_sessions
FROM grid g
JOIN sess s
  ON epoch_us(s.session_start) < (g.bucket + 1) * {w}
 AND epoch_us(s.session_end) >= g.bucket * {w}
GROUP BY g.bucket
"""


QUERIES = {
    "range_join_bucketed": (q_range_join_sessions, ORACLE_RANGE_JOIN),
    "interval_overlap_sessions": (
        q_interval_overlap_sessions,
        _oracle_interval_overlap(),
    ),
}
