"""applyInPandasWithState: state must carry across micro-batches and the
final emitted totals must equal the batch ground truth."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.sources.tables import load_table
from realtimedatapipeline_8_project_spark.streaming.pipeline import decode_events
from realtimedatapipeline_8_project_spark.streaming.stateful import running_user_stats

from .test_streaming import _write_event_jsonl


def test_running_stats_accumulate_across_batches(spark, sf_small, tmp_path):
    src = str(tmp_path / "src")
    n = _write_event_jsonl(spark, sf_small, src, n_files=4)
    raw = spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(src)
    events = decode_events(raw).withColumn("ts", F.col("ts").cast("timestamp"))

    updates = running_user_stats(events)
    sink: list = []
    q = (
        updates.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .foreachBatch(lambda df, bid: sink.append((bid, df.collect())))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(sink) >= 2, "expected multiple micro-batches"
    # last emitted row per user == batch ground truth
    final: dict = {}
    for _, rows in sink:
        for r in rows:
            final[r.user_id] = r
    truth = {
        r.user_id: r
        for r in load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 6).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(truth)
    assert sum(r.n_events for r in truth.values()) == n
    for uid, want in truth.items():
        got = final[uid]
        assert got.n_events == want.n_events, uid
        assert abs(got.total_value - want.total_value) < 1e-4, uid
        assert got.last_ts == want.last_ts, uid
    # monotonic growth of per-user counts across batches (state carried)
    seen: dict = {}
    for _, rows in sink:
        for r in rows:
            assert r.n_events >= seen.get(r.user_id, 0)
            seen[r.user_id] = r.n_events


def test_transform_with_state_accumulates_across_batches(spark, sf_small, tmp_path):
    """transformWithState (RocksDB state store) carries typed state across
    micro-batches; final totals equal the batch ground truth. Skipped
    where protobuf (the TWS state-server wire format) is unavailable."""
    import pytest

    pytest.importorskip("google.protobuf")
    from realtimedatapipeline_8_project_spark.streaming.stateful import (
        running_user_stats_tws,
    )

    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = str(tmp_path / "src")
        n = _write_event_jsonl(spark, sf_small, src, n_files=3)
        raw = spark.readStream.format("text").option("maxFilesPerTrigger", "1").load(src)
        events = decode_events(raw).withColumn("ts", F.col("ts").cast("timestamp"))

        updates = running_user_stats_tws(events)
        sink: list = []
        q = (
            updates.writeStream.outputMode("update")
            .option("checkpointLocation", str(tmp_path / "chk_tws"))
            .foreachBatch(lambda df, bid: sink.append((bid, df.collect())))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prior)

    assert len(sink) >= 2
    final: dict = {}
    for _, rows in sink:
        for r in rows:
            final[r.user_id] = r
    truth = {
        r.user_id: r
        for r in load_table(spark, sf_small, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce("value", F.lit(0.0))), 6).alias("total_value"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert set(final) == set(truth)
    assert sum(r.n_events for r in truth.values()) == n
    for uid, want in truth.items():
        got = final[uid]
        assert got.n_events == want.n_events, uid
        assert abs(got.total_value - want.total_value) < 1e-4, uid
        assert got.last_ts == want.last_ts, uid
