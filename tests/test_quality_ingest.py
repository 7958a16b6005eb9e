"""Streaming quality-stats maintenance (streaming/quality_ingest.py):
the artifact-trained weights must equal the batch operator's weights
EXACTLY (int64 sufficient statistics are associative), replays are
no-ops before AND after compaction, a crashed compaction recovers, and
cold/empty states train to the documented zero weights."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.quality_filter import (
    train_quality_lr,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table
from realtimedatapipeline_8_project_spark.streaming.quality_ingest import (
    QSTATS_SUBDIR,
    compact_quality_stats,
    quality_stats_batch,
    read_quality_stats,
    recover_quality_stats,
    run_quality_ingest,
    train_from_stats_artifact,
)
from realtimedatapipeline_8_project_spark.streaming.sinks import (
    _compacted_through,
)


def _slices(spark, sf_dir, m=4):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return [docs.where(F.col("doc_id") % m == i) for i in range(m)]


def test_streamed_stats_train_equals_batch_operator(spark, sf_small, tmp_path):
    """Four corpus slices drained batch-by-batch: the merged artifact's
    weights == train_quality_lr on the full fixture, integer-exact."""
    out = str(tmp_path / "q")
    for i, sl in enumerate(_slices(spark, sf_small)):
        quality_stats_batch(sl, i, out)
    want, _ = train_quality_lr(spark, sf_small)
    assert train_from_stats_artifact(spark, out) == want

    # unfolded replay: dynamic partition overwrite keeps it idempotent
    quality_stats_batch(_slices(spark, sf_small)[2], 2, out)
    assert train_from_stats_artifact(spark, out) == want

    # compaction folds to one row; weights unchanged; folded replay
    # is a marker-guard no-op (a landed replay would DOUBLE-COUNT the
    # partial sums into the Gram matrix)
    compact_quality_stats(spark, out)
    assert _compacted_through(out, QSTATS_SUBDIR) >= 3
    assert train_from_stats_artifact(spark, out) == want
    quality_stats_batch(_slices(spark, sf_small)[1], 1, out)
    assert train_from_stats_artifact(spark, out) == want
    live = os.path.join(out, QSTATS_SUBDIR)
    assert {
        d for d in os.listdir(live) if d.startswith("batch_id=")
    } == {"batch_id=-1"}


def test_availablenow_stream_with_mid_stream_compaction(
    spark, sf_small, tmp_path
):
    """The real foreachBatch loop over file arrivals, compact_every
    firing mid-stream; malformed rows gated; weights == batch."""
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "text"
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = docs.collect()
    for i in range(3):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as fh:
            for r in rows:
                if r.doc_id % 3 == i:
                    fh.write(
                        json.dumps({"doc_id": r.doc_id, "text": r.text})
                        + "\n"
                    )
            if i == 1:  # malformed arrivals: gated by the corpus filter
                fh.write(json.dumps({"doc_id": None, "text": "x y"}) + "\n")
                fh.write(json.dumps({"doc_id": -7, "text": "w w"}) + "\n")
        time.sleep(1.1)
    raw = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    stream = raw.select(
        F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
        F.get_json_object("value", "$.text").alias("text"),
    )
    out = str(tmp_path / "q")
    run_quality_ingest(
        stream, out, str(tmp_path / "chk"), compact_every=2
    ).awaitTermination()
    assert _compacted_through(out, QSTATS_SUBDIR) >= 1  # fired mid-stream
    want, _ = train_quality_lr(spark, sf_small)
    assert train_from_stats_artifact(spark, out) == want


def test_crash_recovery_and_interleaved_write(spark, sf_small, tmp_path):
    """The shared staged-install contract on this sink: a crash between
    remove and rename is recovered (by the explicit recover call AND by
    the next write's recover-at-entry), value-identical."""
    import shutil

    out = str(tmp_path / "q")
    sl = _slices(spark, sf_small)
    quality_stats_batch(sl[0], 0, out)
    quality_stats_batch(sl[1], 1, out)
    compact_quality_stats(spark, out)

    # crash shape: live moved to staging (complete, marker present)
    live = os.path.join(out, QSTATS_SUBDIR)
    shutil.move(live, os.path.join(out, f"_{QSTATS_SUBDIR}_tmp"))
    assert recover_quality_stats(spark, out) is True
    base = [r for r in read_quality_stats(spark, out).collect()[0]]

    shutil.move(live, os.path.join(out, f"_{QSTATS_SUBDIR}_tmp"))
    quality_stats_batch(sl[2], 2, out)  # recover-at-entry, then write
    assert not os.path.isdir(os.path.join(out, f"_{QSTATS_SUBDIR}_tmp"))
    merged = read_quality_stats(spark, out).collect()[0]
    assert merged["n"] > base[0]


def test_cold_and_empty_states_train_to_zero(spark, tmp_path):
    out = str(tmp_path / "q")
    # cold: no artifact at all
    assert train_from_stats_artifact(spark, out) == [0] * 6
    # an all-malformed batch writes the zero identity row
    bad = spark.createDataFrame(
        [(None, "x y"), (3, None)], "doc_id long, text string"
    )
    quality_stats_batch(bad, 0, out)
    assert read_quality_stats(spark, out).collect()[0]["n"] == 0
    assert train_from_stats_artifact(spark, out) == [0] * 6
    # compacting the zero artifact folds cleanly and stays zero
    compact_quality_stats(spark, out)
    assert train_from_stats_artifact(spark, out) == [0] * 6
