"""As-of join edge cases: equal timestamps match (<=), no-prior rows get
NULL, versions don't leak across keys."""

from __future__ import annotations

from datetime import datetime

from realtimedatapipeline_8_project_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # before any version -> NULL
            (2, 10, _ts("2024-01-01T12:00:00")),  # exactly at v1 -> v1
            (3, 10, _ts("2024-01-01T13:30:00")),  # between v1,v2 -> v1
            (4, 10, _ts("2024-01-01T15:00:00")),  # after v2 -> v2
            (5, 20, _ts("2024-01-01T23:00:00")),  # other key, no versions -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T12:00:00"), 100.0),  # v1
            (10, _ts("2024-01-01T14:00:00"), 200.0),  # v2
            (30, _ts("2024-01-01T00:00:00"), 999.0),  # unrelated key
        ],
        "user_id long, vts timestamp, price double",
    )
    out = {
        r.event_id: r.price
        for r in asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="vts",
            value_cols=["price"],
        ).collect()
    }
    assert out == {1: None, 2: 100.0, 3: 100.0, 4: 200.0, 5: None}


def test_asof_join_keeps_all_left_columns_and_rows(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:00"), "x")],
        "event_id long, user_id long, ts timestamp, extra string",
    )
    right = spark.createDataFrame([], "user_id long, vts timestamp, price double")
    out = asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="vts",
        value_cols=["price"],
    ).collect()
    assert len(out) == 1
    assert out[0].extra == "x" and out[0].price is None
