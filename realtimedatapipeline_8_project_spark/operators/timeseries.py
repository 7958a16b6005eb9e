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


# --- M4 downsampling -------------------------------------------------------
# The standard error-free rendering reduction for time series: per
# (entity, time bucket), keep min/max/first/last of the value — any
# line-chart pixel column drawn from the 4 retained points is identical
# to one drawn from all points. One map-side-combined aggregation; output
# is bounded by entities x buckets, never event count. first/last are
# made deterministic by (ts, event_id) ordering via min_by/max_by on an
# encoded order key (the agg_top1_per_group_sortfree technique — no
# window, no sort).


# order key: BUCKET-RELATIVE microseconds * 2^31 + event_id — monotone
# in (ts, event_id) within a bucket (all min_by/max_by needs) for any
# event_id < 2^31, and bounded: (3.6e9 - 1) * 2^31 + (2^31 - 1)
# ~= 7.73e18 < 2^63 (absolute micros would overflow; a 2^32 shift
# would too). event_id is the fixture's 64-bit row id but stays far
# below 2^31 at every SF; the bound is part of the operator contract
# AND enforced at runtime — an out-of-range id raises mid-job instead
# of silently corrupting first/last (the guard is a row-local branch
# that codegen folds into the projection; on in-range data it never
# fires and the key bits are unchanged, so oracle hashes are stable).
# Shared with the incremental M4 sink (streaming/sinks.py).
M4_OKEY_SQL = (
    "(unix_micros(ts) - unix_micros(date_trunc('hour', ts)))"
    " * 2147483648 + (CASE WHEN event_id BETWEEN 0 AND 2147483647"
    " THEN event_id ELSE CAST(raise_error(CONCAT('m4 order key needs"
    " 0 <= event_id < 2^31, got ', CAST(event_id AS STRING)))"
    " AS BIGINT) END)"
)


def m4_buckets(ev: DataFrame) -> DataFrame:
    """(user_id, bucket, v, ok): the quantized M4 input — shared by the
    batch query and the per-micro-batch partial aggregation."""
    return ev.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        F.col("value").cast(DEC).alias("v"),
        F.expr(M4_OKEY_SQL).alias("ok"),
    )


def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = m4_buckets(load_table(spark, sf_dir, "events"))
    return b.groupBy("user_id", "bucket").agg(
        F.min("v").cast("double").alias("v_min"),
        F.max("v").cast("double").alias("v_max"),
        F.expr("min_by(v, ok)").cast("double").alias("v_first"),
        F.expr("max_by(v, ok)").cast("double").alias("v_last"),
        F.count(F.lit(1)).alias("n_points"),
    )


ORACLE_M4_DOWNSAMPLE = """
WITH b AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket,
         CAST(value AS DECIMAL(27,6)) AS v,
         (epoch_us(ts) - epoch_us(date_trunc('hour', ts))) * 2147483648
           + event_id AS ok
  FROM events
)
SELECT user_id, bucket,
       CAST(MIN(v) AS DOUBLE) AS v_min,
       CAST(MAX(v) AS DOUBLE) AS v_max,
       CAST(min_by(v, ok) AS DOUBLE) AS v_first,
       CAST(max_by(v, ok) AS DOUBLE) AS v_last,
       COUNT(*) AS n_points
FROM b GROUP BY user_id, bucket
"""


QUERIES = {
    "ts_gapfill_forward_fill": (q_gapfill_forward_fill, ORACLE_GAPFILL),
    "scd2_user_state_history": (q_scd2_user_state_history, ORACLE_SCD2),
    "win_trailing_range_frame": (q_trailing_range_frame, ORACLE_TRAILING_RANGE),
    "ts_m4_downsample": (q_m4_downsample, ORACLE_M4_DOWNSAMPLE),
}
