"""Streaming quality-classifier maintenance: the sufficient-statistics
form of ``operators/quality_filter.py`` as a mergeable sink.

The trainer's whole input is 28 additive integers (the 6x6 Gram upper
triangle, X'y, and n — see the operator module), so the streaming form
needs no new math: each micro-batch writes ONE partial-stats row (its
own batch's sums) into a batch_id partition, the serving view merges
partitions by SUM, and training runs the identical driver-local GD on
the merged row. Stream == batch is an EXACT integer identity (int64
sums are associative/commutative), pinned per the gram_ingest
precedent in tests/test_quality_ingest.py.

Crash contract: the shared staged-install discipline from
``streaming/sinks.py`` verbatim — recover-at-entry, the
``_compacted_through`` folded-batch replay no-op guard (a partial-stats
replay after folding would DOUBLE-COUNT its sums into the Gram matrix,
exactly the rollup hazard), idempotent dynamic partition overwrite for
unfolded replays, and ``_compact_partitions`` staging the fold of all
partials into one batch_id=-1 row.

At 100 TB: the per-batch exchange is one combined 28-value row; the
artifact is O(batches) rows of 28 integers until compaction folds it
to exactly one; training cost never touches the corpus again. The
plant (label-by-degradation) is doc-local, so planting per batch
equals planting on the union — the identity the stream==batch pin
relies on."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.quality_filter import (
    _D,
    _gd_weights,
    _stats_agg_exprs,
    _stats_row_to_Ac,
    _training_corpus,
    _with_features,
)
from .sinks import _compact_partitions, _compacted_through, _recover_compaction

QSTATS_SUBDIR = "quality_stats"

_STAT_COLS = (
    ["n"]
    + [f"s_{j}_{k}" for j in range(_D) for k in range(j, _D)]
    + [f"b_{j}" for j in range(_D)]
)
_STATS_SCHEMA = ", ".join(f"{c} bigint" for c in _STAT_COLS) + ", batch_id int"


def _partial_stats(feats: DataFrame) -> DataFrame:
    """One combined partial-stats row for a (featured, labeled) frame —
    the operator's shared agg spelling verbatim (review r15: two
    hand-maintained copies of the 28 expressions were the exact drift
    hazard cut_projection was factored out to prevent). An all-filtered
    batch still writes the all-zero identity row (n=0)."""
    return feats.agg(*_stats_agg_exprs())


def quality_stats_batch(
    batch_df: DataFrame, batch_id: int, output_dir: str
) -> None:
    """foreachBatch body: recover -> folded-replay guard -> plant the
    per-doc degradation labels -> featurize -> append ONE partial-stats
    row keyed by batch_id (dynamic partition overwrite keeps unfolded
    replays idempotent)."""
    _recover_compaction(output_dir, QSTATS_SUBDIR)
    if batch_id <= _compacted_through(output_dir, QSTATS_SUBDIR):
        return  # already folded into batch_id=-1: replay is a no-op
    feats = _with_features(_training_corpus(batch_df))
    (
        _partial_stats(feats)
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(os.path.join(output_dir, QSTATS_SUBDIR))
    )


def read_quality_stats(spark: SparkSession, output_dir: str) -> DataFrame:
    """Serving view: the merged sufficient statistics (one row).
    Explicit schema (the artifact-read discipline): a zero-partition
    dir reads as the typed empty frame -> the merge is the all-zero
    identity row; a MISSING artifact maps to the same cold state."""
    path = os.path.join(output_dir, QSTATS_SUBDIR)
    if not os.path.isdir(path):
        partials = spark.createDataFrame([], _STATS_SCHEMA)
    else:
        partials = spark.read.schema(_STATS_SCHEMA).parquet(path)
    aggs = [
        F.coalesce(F.sum(c), F.lit(0)).alias(c) for c in _STAT_COLS
    ]
    return partials.agg(*aggs)


def train_from_stats_artifact(
    spark: SparkSession, output_dir: str
) -> list[int]:
    """The operator's exact training on the maintained artifact: merge
    the partials (one bounded 28-value driver read) and run the same
    driver-local integer GD. A cold or all-empty artifact trains to
    the documented zero weights."""
    row = read_quality_stats(spark, output_dir).collect()[0]
    n, A, c = _stats_row_to_Ac(row)
    if n == 0:
        return [0] * _D
    return _gd_weights(A, c)[0]


def compact_quality_stats(spark: SparkSession, output_dir: str) -> None:
    """Fold all partial rows into one batch_id=-1 row (staged install +
    marker, the shared crash contract). Amortized O(1)."""
    _compact_partitions(spark, output_dir, QSTATS_SUBDIR, read_quality_stats)


def recover_quality_stats(spark: SparkSession, output_dir: str) -> bool:
    """Finish a crashed compaction install; discard an incomplete
    staging with the live dir untouched. Returns True if a recovery
    landed."""
    return _recover_compaction(output_dir, QSTATS_SUBDIR)


def run_quality_ingest(
    doc_stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
) -> StreamingQuery:
    """Drain ``doc_stream`` (doc_id, text) through the stats-maintenance
    loop with availableNow semantics (the run_gram_ingest shape)."""

    def _body(df: DataFrame, bid: int) -> None:
        quality_stats_batch(df, bid, output_dir)
        if compact_every and (bid + 1) % compact_every == 0:
            compact_quality_stats(df.sparkSession, output_dir)

    return (
        doc_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_body)
        .trigger(availableNow=True)
        .start()
    )
