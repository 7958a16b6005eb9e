"""As-of (point-in-time) join — the temporal join Spark lacks natively.

For each left row, attach the latest right-side version whose timestamp is
<= the left timestamp (per key). Essential for training-data pipelines
(features as-of label time, rate tables, slowly-changing dims).

Implementation is the scalable union-marker technique, not a UDF and not a
range cross-join:

1. tag both sides and union them on (key, ts) — one dataset;
2. one window pass per key ordered by (ts, side): ``last_value(ignorenulls)``
   of the right-side payload STRUCT (non-null per right row even when its
   fields are NULL) gives every left row the most recent right ROW at or
   before it;
3. filter back to left rows.

Cost: ONE shuffle on the key (same as any keyed window), regardless of how
many right versions precede each left row. The naive alternative —
inequality join + max — is a partial cross product that explodes at scale.
DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join: left columns + latest right ``value_cols`` with
    right_ts <= left_ts (per key). Right rows at the exact same timestamp
    as a left row DO match (<=)."""
    # The right payload travels as ONE struct marker (not per-column): the
    # struct is non-null for every right row even when its fields are NULL,
    # so last(ignorenulls) tracks row RECENCY, not value non-nullness — a
    # matched right row with a legitimately NULL value column fills NULL,
    # exactly like DuckDB's ASOF JOIN, instead of leaking an older version.
    l_type = StructType(
        [StructField(c, left.schema[c].dataType, True) for c in left.columns]
    )
    r_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in value_cols]
    )
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_type).alias("_r"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_side",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_rv"),
    )
    out = filled.where(F.col("_side") == 1).select(
        "_l.*", *[F.col(f"_rv.{c}").alias(c) for c in value_cols]
    )
    return out


def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every view event: the user's most recent purchase value at or
    before the view (NULL if none yet) — classic point-in-time feature."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("last_purchase_value"),
        F.col("event_id").alias("p_event"),
    )
    # tie-break concurrent purchases deterministically: keep the max
    # (p_ts, p_event) row per (user, p_ts)
    w = Window.partitionBy("p_user", "p_ts").orderBy(F.desc("p_event"))
    purchases = (
        purchases.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "p_event")
    )
    return asof_join(
        views,
        purchases.withColumnRenamed("p_user", "user_id"),
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        value_cols=["last_purchase_value"],
    )


ORACLE_ASOF_LAST_PURCHASE = """
WITH views AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), purchases AS (
  SELECT user_id AS p_user, ts AS p_ts, value AS last_purchase_value
  FROM events WHERE event_type = 'purchase'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
)
SELECT v.event_id, v.user_id, v.ts, p.last_purchase_value
FROM views v
ASOF LEFT JOIN purchases p
  ON v.user_id = p.p_user AND v.ts >= p.p_ts
"""

def q_pit_state_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension join — the leakage-safe feature lookup of a
    training-data pipeline: for every purchase event, attach the user's
    behavioral state (the SCD2 regime of timeseries.scd2_user_state_history,
    built over NON-purchase events) valid at the purchase instant. Joining
    the *current* dim value instead would leak future state into training
    features; joining on interval containment (valid_from <= ts < valid_to)
    is a range join; expressed as an as-of join against the change points it
    is ONE keyed window pass (see module docstring) — the 100 TB-safe plan.
    State changes at the same instant collapse deterministically to the
    highest event_id (the final state at that timestamp)."""
    ev = load_table(spark, sf_dir, "events")
    behav = ev.where(F.col("event_type") != "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = behav.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    changed = marked.where(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    w_tie = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    dim = (
        changed.withColumn("_rn", F.row_number().over(w_tie))
        .where(F.col("_rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.col("event_type").alias("state_at_event"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        dim,
        key="user_id",
        left_ts="ts",
        right_ts="valid_from",
        value_cols=["state_at_event"],
    )


ORACLE_PIT_STATE_JOIN = """
WITH marked AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events WHERE event_type <> 'purchase'
), dim AS (
  SELECT user_id, ts AS valid_from, event_type AS state_at_event
  FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
), purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, d.state_at_event
FROM purchases p
ASOF LEFT JOIN dim d
  ON p.user_id = d.user_id AND p.ts >= d.valid_from
"""


QUERIES = {
    "asof_last_purchase": (q_asof_last_purchase, ORACLE_ASOF_LAST_PURCHASE),
    "pit_state_join": (q_pit_state_join, ORACLE_PIT_STATE_JOIN),
}
