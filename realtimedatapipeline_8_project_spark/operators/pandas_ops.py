"""Pandas-UDF surface (SURVEY §2.11).

The reference's only UDF is a row-at-a-time Python scalar (`ensure_uuid`,
stream-processor.py:33-38) — replaced JVM-side in this engine. The blessed
Python escape hatches, when built-ins genuinely can't express the logic:

* ``applyInPandas`` group-map (UDAF-equivalent): whole group in, whole
  result out, Arrow-batched. Example: per-user OLS trend of engagement
  value over time — a regression per group is not expressible with
  built-in aggregates alone (it is with enough algebra; the point here is
  the operator shape and its exactness contract).
* scalar ``pandas_udf``: vectorized elementwise transforms.

Both keep data in Arrow columnar batches — 10-100x less overhead than
row-at-a-time UDFs; the group-map shuffles once on the grouping key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..sources.tables import load_table

TREND_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("slope_per_day", DoubleType(), True),
        StructField("mean_value", DoubleType(), True),
    ]
)


def user_trend(events: DataFrame) -> DataFrame:
    """Group-map: one shuffle on user_id, one Arrow batch per group.

    The group function is a self-contained closure (shipped by value via
    cloudpickle) so workers never need this package importable."""

    def _trend(pdf: pd.DataFrame) -> pd.DataFrame:
        # OLS slope of value vs time (days since the user's first event)
        user_id = pdf["user_id"].iloc[0]
        n = len(pdf)
        t = (pdf["ts"] - pdf["ts"].min()).dt.total_seconds() / 86400.0
        v = pdf["value"].astype(float)
        tc, vc = t - t.mean(), v - v.mean()
        denom = float((tc * tc).sum())
        slope = float((tc * vc).sum()) / denom if denom > 0 else None
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "slope_per_day": [round(slope, 6) if slope is not None else None],
                "mean_value": [round(float(v.mean()), 6)],
            }
        )

    return events.groupBy("user_id").applyInPandas(_trend, schema=TREND_SCHEMA)


def q_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check (Python-side math); exactness is pinned by the unit
    test against an independent driver-side computation."""
    return user_trend(load_table(spark, sf_dir, "events"))


QUERIES = {
    "pandas_user_trend": (q_user_trend, None),
}
