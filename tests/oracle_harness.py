"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its oracle SQL side-by-side, sorts columns by name,
and compares row count, column names, and (order-insensitively) every
value — exact equality, including doubles: the engine is designed so both
sides perform identical IEEE/decimal operations, so exact match is the
bar. If exact match holds here, any reasonable driver hash matches too.
"""

from __future__ import annotations

import math
import os
import struct

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Bit-exact: the driver value-hashes raw float64 bits, where
        # -0.0 != +0.0 and any ULP difference fails. Python's == treats
        # -0.0 == 0.0, so compare the IEEE bit pattern instead.
        return ("f64", struct.pack("<d", v).hex())
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sort_key(row):
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=_sort_key
    ), [colnames[i] for i in order]


def compare(spark_df, con, sql: str, name: str = "") -> list[str]:
    """Return list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    d = con.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    s_ms, cols = _rows_to_multiset(s_rows, s_cols)
    d_ms, _ = _rows_to_multiset(d_rows, d_cols)
    if s_ms != d_ms:
        diffs = 0
        for a, b in zip(s_ms, d_ms):
            if a != b:
                if diffs < 3:
                    problems.append(f"{name}: first diff (cols {cols}):\n  spark={a}\n  duck ={b}")
                diffs += 1
        if len(s_ms) != len(d_ms):
            problems.append(f"{name}: multiset sizes {len(s_ms)} vs {len(d_ms)}")
        if diffs:
            problems.append(f"{name}: {diffs} differing rows of {len(s_ms)}")
    return problems
