"""Time-series completion and history-tracking operators (SURVEY §2.7
extension; the serving patterns implied by the reference's time-clustered
history table — cassandra-setup.cql:22-23 keys the metrics table by
(content_id, event_time DESC), i.e. per-entity ordered history).

Three operators the reference's serving layer implies but cannot express
in CQL, built as single-window-pass DataFrame plans:

* ``ts_gapfill_forward_fill`` — densify a per-entity daily series over the
  observed date range and forward-fill gaps (dashboards need a row per
  day, not just per active day).
* ``scd2_user_state_history`` — collapse a per-entity event stream into
  type-2 slowly-changing-dimension validity intervals (state, valid_from,
  valid_to, is_current) — the warehouse view of "latest per key" (K3)
  extended with full history.
* ``win_trailing_range_frame`` — trailing 1-hour per-entity rolling sum
  with a RANGE frame over event time (the README's "real-time engagement"
  rollup as a batch/stream-shared window shape).

Scale notes: all three are one shuffle on the entity key, then
sorted-window passes within partitions. The gap-fill grid is bounded by
|entities| x |days| (never by event count), built via ``sequence`` +
``explode`` from a single-row bounds aggregate — no driver-side action.
Exact arithmetic (functions/exact.py) keeps every value bit-stable across
engines and partition counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import DEC, dsum, oracle_dsum
from ..sources.tables import load_table

# --- daily densify + forward fill -----------------------------------------


def q_gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value", "day_value"),
    )
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("dmin"), F.max(F.to_date("ts")).alias("dmax")
    )
    users = ev.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(
            F.sequence(F.col("dmin"), F.col("dmax"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    joined = grid.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        F.when(F.col("day_value").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_gap"
        ),
    )


ORACLE_GAPFILL = f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         {oracle_dsum('value', 'day_value')}
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS dmin, MAX(CAST(ts AS DATE)) AS dmax FROM events
), grid AS (
  SELECT u.user_id,
         CAST(unnest(generate_series(CAST(b.dmin AS TIMESTAMP),
                                     CAST(b.dmax AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN bounds b
)
SELECT g.user_id, g.day,
       COALESCE(d.n_events, 0) AS n_events,
       LAST_VALUE(d.day_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       CASE WHEN d.day_value IS NULL THEN 1 ELSE 0 END AS is_gap
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
"""


# --- SCD2 validity intervals ----------------------------------------------


def q_scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of each user's event_type 'state': consecutive repeats
    collapse into one interval; each interval carries valid_from/valid_to
    (half-open) and a per-user version number. (ts, event_id) is a unique
    order key, so change detection is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changed.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.when(F.lead("ts").over(w2).isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "is_current"
        ),
    )


ORACLE_SCD2 = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
), changed AS (
  SELECT user_id, event_type, ts, event_id FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type AS state, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS version,
       CASE WHEN LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            IS NULL THEN 1 ELSE 0 END AS is_current
FROM changed
"""


# --- trailing RANGE frame --------------------------------------------------

HOUR_US = 3_600_000_000


def q_trailing_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing 1-hour rolling sum/count with a RANGE frame over
    event time (microsecond precision on both engines). Unlike a ROWS
    frame, the window adapts to event density — the streaming 'last hour'
    rollup expressed as one sorted window pass."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-HOUR_US, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum(F.col("value").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("trailing_1h_value"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
    )


ORACLE_TRAILING_RANGE = f"""
SELECT event_id, user_id, ts,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(27,6))) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN {HOUR_US} PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS trailing_1h_value,
       COUNT(*) OVER (
         PARTITION BY user_id ORDER BY epoch_us(ts)
         RANGE BETWEEN {HOUR_US} PRECEDING AND CURRENT ROW) AS n_1h
FROM events
"""


QUERIES = {
    "ts_gapfill_forward_fill": (q_gapfill_forward_fill, ORACLE_GAPFILL),
    "scd2_user_state_history": (q_scd2_user_state_history, ORACLE_SCD2),
    "win_trailing_range_frame": (q_trailing_range_frame, ORACLE_TRAILING_RANGE),
}
