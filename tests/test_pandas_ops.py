"""applyInPandas group-map: exactness vs an independent driver-side
computation of the same integer recurrence, agreement with plain float
OLS, and edge-case shape."""

from __future__ import annotations

import math

import pytest

from realtimedatapipeline_8_project_spark.operators.pandas_ops import user_trend
from realtimedatapipeline_8_project_spark.sources.tables import load_table


def test_user_trend_matches_driver_side_integer_ols(spark, sf_small):
    ev = load_table(spark, sf_small, "events")
    got = {r.user_id: r for r in user_trend(ev).collect()}

    pdf = ev.select("user_id", "ts", "value").toPandas()
    import datetime as dt

    for uid, g in pdf.groupby("user_id"):
        rows = {
            "ts": [
                ts.to_pydatetime().replace(tzinfo=dt.timezone.utc)
                for ts in g["ts"]
            ],
            "value": list(g["value"]),
        }
        # timestamp() on aware datetimes -> exact epoch micros
        us = [int(ts.timestamp() * 1_000_000) for ts in rows["ts"]]
        us0 = min(us)
        t = [(u - us0) // 1_000_000 for u in us]
        v100 = [int(math.floor(v * 100 + 0.5)) for v in rows["value"]]
        n = len(v100)
        st, sv = sum(t), sum(v100)
        stt = sum(x * x for x in t)
        stv = sum(x * y for x, y in zip(t, v100))
        num, den = n * stv - st * sv, n * stt - st * st
        want_slope = (
            float((2 * num * 864_000_000 + den) // (2 * den)) / 1e6
            if den > 0
            else None
        )
        want_mean = float((2 * sv * 10_000 + n) // (2 * n)) / 1e6
        r = got[uid]
        assert r.n_events == n
        assert r.mean_value == want_mean  # bit-exact, not approx
        assert r.slope_per_day == want_slope

        # and the quantized slope tracks plain float OLS
        if den > 0 and n > 2:
            tm = sum(t) / n
            vm = sum(v100) / 100 / n
            fden = sum((x - tm) ** 2 for x in t)
            if fden > 0:
                fslope = (
                    sum((x - tm) * (y / 100 - vm) for x, y in zip(t, v100))
                    / fden
                    * 86400
                )
                assert r.slope_per_day == pytest.approx(fslope, abs=1e-4)


def test_single_event_user_has_null_slope(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 5.0)], "user_id long, ts timestamp, value double"
    )
    r = user_trend(df).collect()[0]
    assert r.n_events == 1 and r.slope_per_day is None
    assert r.mean_value == 5.0


def test_negative_slope_floor_division_parity(spark):
    """Negative-slope groups exercise the DuckDB mod-normalized floor
    division path — pin Spark-side and oracle values identical."""
    from datetime import datetime, timedelta

    import duckdb

    rows = [
        (i, datetime(2024, 1, 1) + timedelta(seconds=17 * i), 1, 100.0 - 3.7 * i)
        for i in range(9)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = user_trend(df).collect()[0]
    assert got.slope_per_day is not None and got.slope_per_day < 0

    from realtimedatapipeline_8_project_spark.operators.pandas_ops import (
        _oracle_user_trend,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({eid}, TIMESTAMP '{ts}', {uid}, {val})"
            for eid, ts, uid, val in rows
        )
        + ") t(event_id, ts, user_id, value)"
    )
    want = con.execute(_oracle_user_trend()).fetchall()[0]
    assert (got.user_id, got.n_events, got.slope_per_day, got.mean_value) == want


def test_null_and_nan_values_are_excluded_not_fatal(spark):
    """NULL/NaN value rows (and NULL ts) must be dropped per the explicit
    NULL policy — not crash the Arrow closure (math.floor(nan) raises) —
    and an all-NULL user must vanish from the output, as in the oracle's
    WHERE clause."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 10.0),
        (1, t0 + timedelta(hours=1), None),
        (1, t0 + timedelta(hours=2), float("nan")),
        (1, t0 + timedelta(hours=3), 16.0),
        (1, None, 99.0),
        (2, t0, None),  # user 2: no usable observation at all
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r.user_id: r for r in user_trend(df).collect()}
    assert set(got) == {1}
    r = got[1]
    assert r.n_events == 2
    assert r.mean_value == 13.0
    # slope: 6/day over 3h gap -> (16-10)/(3h) * 24h = 48.0 per day
    assert r.slope_per_day == pytest.approx(48.0, abs=1e-6)


def test_native_twin_row_identical_to_pandas_spelling(spark, sf_small):
    """The registered JVM spelling (optimization r15) must stay
    row-identical — bit-exact doubles included — to the applyInPandas
    API-surface spelling on the fixture AND on synthetic edge frames
    (negative slope, single event, NULL/NaN mix)."""
    from datetime import datetime, timedelta

    from realtimedatapipeline_8_project_spark.operators.pandas_ops import (
        user_trend_native,
    )

    def check(df):
        a = sorted(tuple(r) for r in user_trend(df).collect())
        b = sorted(tuple(r) for r in user_trend_native(df).collect())
        assert a == b

    check(load_table(spark, sf_small, "events"))

    t0 = datetime(2024, 1, 1)
    rows = [
        # negative slope (floor-division sign path)
        *[
            (1, t0 + timedelta(seconds=17 * i), 100.0 - 3.7 * i)
            for i in range(9)
        ],
        # single event -> NULL slope
        (2, t0, 5.0),
        # NULL/NaN mix + all-NULL user
        (3, t0, 10.0),
        (3, t0 + timedelta(hours=1), None),
        (3, t0 + timedelta(hours=2), float("nan")),
        (3, t0 + timedelta(hours=3), 16.0),
        (3, None, 99.0),
        (4, t0, None),
    ]
    check(
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )
    )
