"""Snapshot-diff / merge algebra (operators/cdc.py): the change feed must
be exactly the delta between the two states — applying it to the old
state reconstructs the new state bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.cdc import (
    CUT,
    NEW_END,
    _state,
    q_merge_apply_changes,
    q_snapshot_diff_cdc,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table


def test_merge_applied_changes_reconstructs_new_state(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    new_state = _state(ev, CUT, NEW_END)
    applied = q_merge_apply_changes(spark, sf_small)
    assert applied.exceptAll(new_state).isEmpty()
    assert new_state.exceptAll(applied).isEmpty()


def test_diff_classes_partition_the_key_space(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    diff = q_snapshot_diff_cdc(spark, sf_small)
    n_old = _state(ev, "2024-01-08", CUT).count()
    n_new = _state(ev, CUT, NEW_END).count()
    by_type = {
        r["change_type"]: r["n"]
        for r in diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_type.get("delete", 0) + by_type.get("update", 0) + by_type.get(
        "unchanged", 0
    ) == n_old
    assert by_type.get("insert", 0) + by_type.get("update", 0) + by_type.get(
        "unchanged", 0
    ) == n_new
