"""load_table must normalize every parquet timestamp encoding the driver
fixtures have shipped to a session-TZ TimestampType (session TZ is pinned
UTC in session.py). Round 2 regressed when the fixtures moved from
TIMESTAMP(NANOS) to TIMESTAMP_MICROS(isAdjustedToUTC=false) — which Spark
4.x reads as TIMESTAMP_NTZ — and every ``unix_micros`` call-site threw
DATATYPE_MISMATCH. This test writes a tiny events.parquet in each of the
three physical encodings and asserts load_table yields identical
``timestamp``-typed wall-clock values for all of them.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.sources.tables import load_table

_ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 0), 7, "play", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 1, 0, 30, 0), 7, "pause", 2.5, "{}"),
    (3, dt.datetime(2024, 1, 2, 12, 0, 0), 9, "finish", 3.5, "{}"),
]


def _write_events(dirpath: str, ts_type: pa.DataType, utc: bool) -> None:
    os.makedirs(dirpath, exist_ok=True)
    tzinfo = dt.timezone.utc if utc else None
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array(
                [r[1].replace(tzinfo=tzinfo) for r in _ROWS], ts_type
            ),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(dirpath, "events.parquet"))


ENCODINGS = {
    # round-1 fixtures: TIMESTAMP(NANOS) — vectorized reader needs nanosAsLong
    "nanos": (pa.timestamp("ns"), False),
    # round-2 fixtures: TIMESTAMP_MICROS isAdjustedToUTC=false -> Spark NTZ
    "micros_ntz": (pa.timestamp("us"), False),
    # instant-semantics micros -> Spark session-TZ TimestampType directly
    "micros_utc": (pa.timestamp("us", tz="UTC"), True),
}


@pytest.mark.parametrize("enc", list(ENCODINGS))
def test_load_table_normalizes_ts_encoding(spark, tmp_path, enc):
    ts_type, utc = ENCODINGS[enc]
    d = str(tmp_path / enc)
    _write_events(d, ts_type, utc)
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r["u"]
        for r in df.select(F.unix_micros("ts").alias("u"))
        .orderBy("u")
        .collect()
    ]
    want = sorted(
        int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
        for r in _ROWS
    )
    assert got == want, f"{enc}: wall-clock micros mismatch"


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def test_nanos_conf_latched_only_for_nanos_files(spark, tmp_path):
    """A micros-encoded load must not touch the session conf (vanilla
    driver sessions stay pristine); a nanos load latches it and a mixed
    session keeps normalizing every encoding afterwards."""
    d_us = str(tmp_path / "us")
    d_ns = str(tmp_path / "ns")
    _write_events(d_us, pa.timestamp("us"), False)
    _write_events(d_ns, pa.timestamp("ns"), False)
    prior = spark.conf.get(_NANOS_CONF, None)
    spark.conf.unset(_NANOS_CONF)
    try:
        load_table(spark, d_us, "events").collect()
        assert spark.conf.get(_NANOS_CONF, "false") == "false"
        want = sorted(
            int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
            for r in _ROWS
        )
        for d in (d_ns, d_us, d_ns):  # mixed-encoding session
            got = [
                r["u"]
                for r in load_table(spark, d, "events")
                .select(F.unix_micros("ts").alias("u"))
                .orderBy("u")
                .collect()
            ]
            assert got == want
        assert spark.conf.get(_NANOS_CONF) == "true"
    finally:
        if prior is not None:
            spark.conf.set(_NANOS_CONF, prior)


def test_real_fixture_ts_is_timestamp(spark, sf_small):
    df = load_table(spark, sf_small, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # unix_micros is the call the broken encodings rejected — must resolve
    df.select(F.unix_micros("ts")).limit(1).collect()
