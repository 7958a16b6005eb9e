"""Streaming corpus ingestion with incremental dedup — the T7 x §2.13
synthesis: documents arrive as a stream, each micro-batch dedups against
everything kept so far (operators/dedup.py:incremental_dedup), and the
kept corpus + its band table grow as idempotent batch-partitioned
parquet (the write_history discipline from sinks.py).

Per batch N:
1. base = kept docs of batches < N; bands = stored band partitions < N
   (the ingest-time artifact — batch N never re-derives the base's
   signatures, only its own).
2. verdict = incremental_dedup(base, batch, base_bands=bands); kept =
   batch rows the verdict keeps.
3. kept docs and THEIR bands are written under partition batch_id=N with
   dynamic partition overwrite.

Recovery/idempotency: a replayed batch N reads strictly batch_id < N, so
it recomputes the identical verdict and overwrites its own partitions —
effective exactly-once on the kept corpus (pinned by test alongside the
replay-equals-sequential-batch parity).

Semantics note: dedup is delta-vs-accumulated-base; duplicates WITHIN a
single micro-batch are not paired against each other (same contract as
incremental_dedup). Compaction or an exact-fingerprint pass downstream
covers intra-batch dups where that matters.

Scale: each batch's cost is proportional to the batch and its band
collisions — the base corpus is touched only via its stored band table
and the few candidate docs re-shingled for verification. The kept/bands
tables are append-only partitions; no rewrite ever touches old batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import base_band_table, incremental_dedup

KEPT = "kept"
BANDS = "bands"


def _read_prior(
    spark: SparkSession, path: str, batch_id: int
) -> DataFrame | None:
    try:
        df = spark.read.parquet(path)
    except Exception:
        return None
    return df.where(F.col("batch_id") < batch_id).drop("batch_id")


def dedup_ingest_batch(
    batch_df: DataFrame, batch_id: int, corpus_dir: str
) -> None:
    """foreachBatch body: dedup ``batch_df`` (doc_id, text) against the
    accumulated kept corpus and append the survivors + their bands.

    Malformed rows (NULL id, NULL/empty text — routine in real streams:
    truncated JSON, missing fields) are dropped at the gate: a NULL id
    can never be deduped later and empty text has no content to match,
    so admitting either would pollute the kept corpus forever (the F3
    guard discipline applied to content)."""
    spark = batch_df.sparkSession
    delta = batch_df.select("doc_id", "text").where(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & (F.col("text") != "")
    )
    if delta.isEmpty():
        return
    kept_path = os.path.join(corpus_dir, KEPT)
    bands_path = os.path.join(corpus_dir, BANDS)
    base = _read_prior(spark, kept_path, batch_id)
    bands = _read_prior(spark, bands_path, batch_id)
    if base is not None and bands is not None and not base.isEmpty():
        verdict = incremental_dedup(base, delta, base_bands=bands)
        kept = delta.join(
            verdict.where(F.col("is_kept")).select("doc_id"), "doc_id"
        )
    else:
        kept = delta
    for df, path in (
        (kept, kept_path),
        (base_band_table(kept), bands_path),
    ):
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(path)
        )


def run_dedup_ingest(
    docs_stream: DataFrame, corpus_dir: str, checkpoint_dir: str
) -> StreamingQuery:
    """Drain ``docs_stream`` (doc_id, text) through dedup ingestion with
    availableNow semantics (each call processes what has arrived, then
    stops — the batch-backfill trigger; a production run swaps in a
    processing-time trigger, nothing else changes)."""
    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            lambda df, bid: dedup_ingest_batch(df, bid, corpus_dir)
        )
        .trigger(availableNow=True)
        .start()
    )


def read_kept(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The accumulated deduplicated corpus (doc_id, text, batch_id)."""
    return spark.read.parquet(os.path.join(corpus_dir, KEPT))
