"""The reference's engagement pipeline, bit-faithful (SURVEY §2.3, E1).

``enrich_reference`` reproduces stream-processor.py:240-281 exactly on
reference-shaped inputs (ENGAGEMENT_EVENT / CONTENT schemas):

* event_id/content_id/user_id UUID-normalized — deterministically (P14;
  the reference's uuid4 fallback is replaced by uuid5-style sha256)
* event_time = CAST(event_ts AS TIMESTAMP)             (:244)
* engagement_seconds = duration_ms / 1000 AS DOUBLE    (:272)
* engagement_pct = ROUND((duration_ms/1000.0)/length_seconds, 2)
  iff length_seconds AND duration_ms are both non-NULL (:273-279)
* broadcast left join keeps unmatched events with NULL content columns
  (:268-271; README worked example rows README.md:176-188)

``q_reference_metrics`` runs the same dataflow over reference-shaped rows
synthesized deterministically from the fixture tables, with a DuckDB oracle
mirroring every step — so the reference's exact semantics are part of the
driver-checked suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.uuid_repair import oracle_uuid_normalize, uuid_normalize
from ..sources.tables import load_table


def enrich_reference(events: DataFrame, content: DataFrame) -> DataFrame:
    """events: id, content_id, user_id, event_type, event_ts, duration_ms,
    device. content: id, content_type, length_seconds (+ extra cols ok)."""
    dim = content.select(
        F.col("id").alias("_dim_id"), "content_type", "length_seconds"
    )
    out = (
        events.withColumn("event_time", F.col("event_ts").cast("timestamp"))
        .join(F.broadcast(dim), F.col("content_id") == F.col("_dim_id"), "left")
        .drop("_dim_id")
    )
    secs = (F.col("duration_ms") / 1000).cast("double")
    pct = F.when(
        F.col("length_seconds").isNotNull() & F.col("duration_ms").isNotNull(),
        F.round((F.col("duration_ms") / 1000.0) / F.col("length_seconds"), 2),
    ).otherwise(F.lit(None).cast("double"))
    return out.select(
        uuid_normalize(F.col("id").cast("string")).alias("event_id"),
        uuid_normalize(F.col("content_id")).alias("content_id"),
        uuid_normalize(F.col("user_id")).alias("user_id"),
        F.col("event_time"),
        F.col("duration_ms"),
        F.col("content_type"),
        F.col("length_seconds"),
        secs.alias("engagement_seconds"),
        pct.alias("engagement_pct"),
    )


def _synth_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic reference-shaped events from the fixture: duration_ms
    from value, content_id keyed to part-ids with a ~7% unmatched tail,
    NULL duration for click/error rows (mirrors FIXTURES.md generation)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("id"),
        F.concat(F.lit("content-"), (F.col("event_id") % 15).cast("string")).alias(
            "content_id"
        ),
        F.concat(F.lit("user-"), F.col("user_id").cast("string")).alias("user_id"),
        F.col("event_type"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("event_ts"),
        F.when(
            ~F.col("event_type").isin("click", "error"),
            F.round(F.col("value") * 1000, 0).cast("long"),
        ).alias("duration_ms"),
        F.lit("web").alias("device"),
    )


def _synth_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension of 14 content rows (ids content-0..13 => content-14 is the
    unmatched tail), content_type cycling the reference enum, newsletter
    rows NULL length (setup.sql:6-7 semantics)."""
    part = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 14)
    ctype = F.element_at(
        F.array(F.lit("podcast"), F.lit("newsletter"), F.lit("video")),
        (F.col("p_partkey") % 3 + 1).cast("int"),
    )
    return part.select(
        F.concat(F.lit("content-"), F.col("p_partkey").cast("string")).alias("id"),
        ctype.alias("content_type"),
        F.when(ctype != "newsletter", F.col("p_size") * 60).alias("length_seconds"),
    )


def q_reference_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return enrich_reference(_synth_events(spark, sf_dir), _synth_content(spark, sf_dir))


_UUID_ID = oracle_uuid_normalize("CAST(e.id AS VARCHAR)")
_UUID_CONTENT = oracle_uuid_normalize("e.content_id")
_UUID_USER = oracle_uuid_normalize("e.user_id")

ORACLE_REFERENCE_METRICS = f"""
WITH e AS (
  SELECT event_id AS id,
         concat('content-', CAST(event_id % 15 AS VARCHAR)) AS content_id,
         concat('user-', CAST(user_id AS VARCHAR)) AS user_id,
         event_type,
         strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS event_ts,
         CASE WHEN event_type NOT IN ('click','error')
              THEN CAST(ROUND(value * 1000, 0) AS BIGINT) END AS duration_ms
  FROM events
), c AS (
  SELECT concat('content-', CAST(p_partkey AS VARCHAR)) AS id,
         (['podcast','newsletter','video'])[CAST(p_partkey % 3 AS INTEGER) + 1]
           AS content_type,
         CASE WHEN (['podcast','newsletter','video'])[CAST(p_partkey % 3 AS INTEGER) + 1]
                   <> 'newsletter'
              THEN p_size * 60 END AS length_seconds
  FROM part WHERE p_partkey < 14
)
SELECT
  {_UUID_ID} AS event_id,
  {_UUID_CONTENT} AS content_id,
  {_UUID_USER} AS user_id,
  CAST(e.event_ts AS TIMESTAMP) AS event_time,
  e.duration_ms,
  c.content_type,
  c.length_seconds,
  CAST(e.duration_ms / 1000 AS DOUBLE) AS engagement_seconds,
  CASE WHEN c.length_seconds IS NOT NULL AND e.duration_ms IS NOT NULL
       THEN ROUND((e.duration_ms / 1000.0) / c.length_seconds, 2)
  END AS engagement_pct
FROM e LEFT JOIN c ON e.content_id = c.id
"""

QUERIES = {
    "reference_engagement_metrics": (q_reference_metrics, ORACLE_REFERENCE_METRICS),
}
