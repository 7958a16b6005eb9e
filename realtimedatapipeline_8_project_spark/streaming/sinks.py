"""foreachBatch fan-out sinks (SURVEY §2.2 K1-K4, T6).

The reference fans each micro-batch out to Cassandra (history) and Redis
(latest-per-key) from a foreachBatch callback (stream-processor.py:283-324,
337-342) with non-atomic dual writes — at-least-once. Our engine keeps the
foreachBatch shape but makes both sinks *idempotent* so checkpoint-recovery
re-runs converge (effective exactly-once):

* history sink  (K2 analog): parquet, partitioned by a stable batch epoch —
  re-running batch N overwrites batch N's partition only (no dupes), and
  the table layout is partition-keyed like the Cassandra PK
  (cassandra-setup.cql:22-23).
* latest sink   (K3 analog): per-key latest-wins view, recomputed by merge
  of (existing latest) + (batch), deduped on key by event_time desc —
  the Redis last-write-wins hash semantics.

At scale: dynamic partition overwrite touches only the partitions in the
incoming batch; the latest view merge is keyed and can back a compacted
topic / Delta MERGE; nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_history(batch_df: DataFrame, batch_id: int, output_dir: str) -> None:
    """Idempotent append: batch-id partition overwrite (K2 analog)."""
    (
        batch_df.withColumn("batch_id", F.lit(batch_id))
        .repartition("segment")
        .sortWithinPartitions(F.desc("event_time"))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(output_dir, "history"))
    )


def write_latest(batch_df: DataFrame, batch_id: int, output_dir: str) -> None:
    """Keyed latest-wins upsert (K3 analog): merge existing latest view with
    the batch, keep newest row per event_id."""
    spark = batch_df.sparkSession
    latest_path = os.path.join(output_dir, "latest")
    tmp_path = os.path.join(output_dir, "_latest_tmp")
    try:
        existing = spark.read.parquet(latest_path)
        merged = existing.unionByName(batch_df.select(*existing.columns))
    except Exception:
        merged = batch_df
    w = Window.partitionBy("event_id").orderBy(
        F.desc("event_time"), F.desc("duration")
    )
    deduped = (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    # write-then-swap keeps the view readable and makes re-runs idempotent
    deduped.write.mode("overwrite").parquet(tmp_path)
    spark.read.parquet(tmp_path).write.mode("overwrite").parquet(latest_path)


def write_batch_fanout(batch_df: DataFrame, batch_id: int, output_dir: str) -> None:
    """K1: one micro-batch -> both sinks. The reference used a
    ThreadPoolExecutor(max_workers=1) here — i.e. serial writes in practice
    (SURVEY appendix); we write serially on purpose and cache the batch so
    the two sinks share one evaluation."""
    if batch_df.isEmpty():  # F3 empty-batch guard, without the RDD detour
        return
    batch_df.persist()
    try:
        write_history(batch_df, batch_id, output_dir)
        write_latest(batch_df, batch_id, output_dir)
    finally:
        batch_df.unpersist()
