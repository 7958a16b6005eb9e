"""Custom stateful streaming operator (SURVEY T7 extension; north-star
"custom stateful operators" via applyInPandasWithState).

``running_user_stats`` keeps per-user state (event count, value sum, last
seen timestamp) across micro-batches and emits the updated row for every
user present in the batch — the building block for live per-entity
counters that built-in streaming aggregation can't express when the
update logic is arbitrary Python (decay, custom thresholds, model state).

State is a fixed-width tuple per key — executor memory is O(distinct
keys), not O(events); Spark checkpoints it with the query, so recovery
resumes exactly where the state left off.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("total_value", DoubleType(), True),
        StructField("last_ts", TimestampType(), True),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("total", DoubleType(), False),
        StructField("last_us", LongType(), False),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """events: streaming DF with (user_id, ts, value). Emits the running
    totals for each user seen in the micro-batch. The update function is a
    self-contained closure (shipped by value) — workers never import this
    package."""

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
            batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
            last_us = max(last_us, batch_max_us)
        state.update((n, round(total, 6), last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 6)],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Same running per-user totals on the transformWithState API (the
    current-generation arbitrary-state operator: typed state handles,
    timers, TTL — applyInPandasWithState's successor).

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider``) — state lives off-heap and
    spills to disk, which is what makes huge key spaces viable on a real
    cluster — and ``protobuf`` on the driver (the transformWithState
    state-server protocol; raises ImportError with a clear message where
    it is unavailable, e.g. this container). The processor class is
    defined inside this function so cloudpickle ships it by value
    (workers never import this package)."""
    try:
        import google.protobuf  # noqa: F401  (state-server wire format)
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package for its "
            "state-server protocol; use running_user_stats "
            "(applyInPandasWithState) where protobuf is unavailable"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE, last_us BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            prior = self._stats.get() if self._stats.exists() else None
            n, total, last_us = prior if prior is not None else (0, 0.0, 0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                batch_max_us = int(pdf["ts"].astype("int64").max()) // 1000
                last_us = max(last_us, batch_max_us)
            self._stats.update((n, round(total, 6), last_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "last_ts": [pd.Timestamp(last_us, unit="us")],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
