"""applyInPandas group-map: exactness vs an independent driver-side
computation, and batch-shape sanity."""

from __future__ import annotations

import pandas as pd
import pytest

from realtimedatapipeline_8_project_spark.operators.pandas_ops import user_trend
from realtimedatapipeline_8_project_spark.sources.tables import load_table


def test_user_trend_matches_driver_side_ols(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    got = {r.user_id: r for r in user_trend(ev).collect()}

    pdf = ev.select("user_id", "ts", "value").toPandas()
    for uid, g in pdf.groupby("user_id"):
        t = (g["ts"] - g["ts"].min()).dt.total_seconds() / 86400.0
        v = g["value"].astype(float)
        tc, vc = t - t.mean(), v - v.mean()
        denom = float((tc * tc).sum())
        want_slope = round(float((tc * vc).sum()) / denom, 6) if denom > 0 else None
        r = got[uid]
        assert r.n_events == len(g)
        assert r.mean_value == pytest.approx(round(float(v.mean()), 6))
        if want_slope is None:
            assert r.slope_per_day is None
        else:
            assert r.slope_per_day == pytest.approx(want_slope)


def test_single_event_user_has_null_slope(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 5.0)], "user_id long, ts timestamp, value double"
    )
    r = user_trend(df).collect()[0]
    assert r.n_events == 1 and r.slope_per_day is None
