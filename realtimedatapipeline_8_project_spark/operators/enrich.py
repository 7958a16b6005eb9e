"""Flagship enrichment dataflow (SURVEY §2.5 J1, §2.3 P7-P9, §2.4 F2).

Re-expresses the reference's core computation — broadcast left-outer
enrichment of an event stream against a cached dimension snapshot plus
derived engagement metrics (stream-processor.py:252-281):

* dimension snapshot with manual column pruning  (:264)
* ``.cache()`` + explicit ``broadcast()``          (:265, :268)
* left outer equi-join, stream side preserved      (:268-271)
* ``engagement_seconds = duration/1000`` as double (:272)
* ``engagement_pct = round(seconds/length, N)`` guarded by IS NOT NULL
  conjunction, NULL otherwise                      (:273-279)

The rounding uses :func:`..functions.exact.fround` (pure-IEEE floor form)
rather than ``F.round``: DuckDB's ROUND emits ``-0.0`` for tiny negative
quotients (negative ``c_acctbal``) where Spark's decimal-rendering round
normalizes to ``+0.0`` — equal values, different bits, failed value-hash.

Fixture mapping: ``events`` plays the engagement stream (``value`` is the
duration-like payload), ``customer`` plays the content dimension
(``c_mktsegment`` ~ content_type, ``c_acctbal`` ~ length_seconds). ~1/15 of
user_ids have no matching customer, exercising the left-join-miss NULL path
the README worked example demonstrates (README.md:176-188).

Scale notes: the dimension is broadcast (no shuffle of the 100 TB fact
side); the derived columns are pure whole-stage-codegen projections; the
join preserves the fact table's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import fround, oracle_fround
from ..sources.tables import load_table


def load_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension snapshot with column pruning, mirroring
    stream-processor.py:264's ``.select("id","content_type","length_seconds")``."""
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )


def enrich_events(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Broadcast left join + derived engagement metrics.

    Works identically on a batch DataFrame and a streaming DataFrame
    (stream-static join), like the reference's enrich_with_postgres.

    The explicit broadcast encodes the reference's contract that the
    dimension is an operational-DB snapshot (bounded, MBs-to-low-GBs) —
    the right call no matter how large the fact stream grows. If the
    dimension itself outgrew executor memory, drop the hint and let AQE
    pick a shuffle join; the query text is otherwise unchanged."""
    joined = events.join(
        F.broadcast(dim), events["user_id"] == dim["c_custkey"], "left"
    ).drop("c_custkey")  # drop duplicate join key (reference kept both; SURVEY appendix)
    return (
        joined.withColumn(
            "engagement_seconds", (F.col("value") / F.lit(1000.0)).cast("double")
        )
        .withColumn(
            "engagement_pct",
            F.when(
                F.col("c_acctbal").isNotNull()
                & F.col("value").isNotNull()
                & (F.col("c_acctbal") != 0),
                fround((F.col("value") / F.lit(1000.0)) / F.col("c_acctbal"), 6),
            ).otherwise(F.lit(None).cast("double")),
        )
    )


def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    out = enrich_events(events, load_dim(spark, sf_dir))
    return out.select(
        F.col("event_id"),
        F.col("ts").alias("event_time"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value").alias("duration"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("engagement_seconds"),
        F.col("engagement_pct"),
    )


pct_round = oracle_fround("(e.value / 1000.0) / c.c_acctbal", 6)

ORACLE_ENRICH = f"""
SELECT
  e.event_id,
  e.ts AS event_time,
  e.user_id,
  e.event_type,
  e.value AS duration,
  c.c_mktsegment AS segment,
  c.c_acctbal AS acctbal,
  CAST(e.value / 1000.0 AS DOUBLE) AS engagement_seconds,
  CASE
    WHEN c.c_acctbal IS NOT NULL AND e.value IS NOT NULL AND c.c_acctbal <> 0
    THEN {pct_round}
    ELSE NULL
  END AS engagement_pct
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
"""

QUERIES = {
    "enrich_broadcast_left_join": (q_enrich, ORACLE_ENRICH),
}
