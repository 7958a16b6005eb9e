"""Exact (order-independent) aggregation helpers.

Floating-point SUM/AVG results depend on reduction order, which differs
between Spark partitions and the DuckDB oracle (and between cluster sizes).
For any aggregate the driver value-hashes, we:

1. cast the double operand to DECIMAL(27,6) (fixture monetary/quantity
   columns carry <=2 fractional digits, so this is lossless),
2. SUM in exact decimal arithmetic (order-independent),
3. ROUND the exact sum to scale 2 — keeping the unscaled value < 2^53 so
   step 4 is a single exact int->double conversion plus one IEEE division
   by 100.0, identical in every engine,
4. cast to DOUBLE.

The oracle SQL mirrors the same steps, so both engines produce
bit-identical doubles regardless of partition count or reduction order —
results are stable whether the query runs on 32 local threads or 1000
executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, alias: str) -> Column:
    """Exact order-independent sum of a <=2dp double, as double."""
    return F.round(F.sum(_c(col).cast(DEC)), 2).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent average: exact rounded sum / non-null count."""
    c = _c(col)
    return (
        F.round(F.sum(c.cast(DEC)), 2).cast("double") / F.count(c)
    ).alias(alias)


def dsum_product(a: Column | str, b: Column | str, alias: str) -> Column:
    """Exact sum of a*b where both are <=2dp doubles (e.g. price*(1-disc)).

    decimal(12,2) * decimal(8,6) stays well inside 38 digits, so the
    product and sum are exact."""
    prod = _c(a).cast("decimal(12,2)") * _c(b).cast("decimal(8,6)")
    return F.round(F.sum(prod), 2).cast("double").alias(alias)


def fround(col: Column, n: int) -> Column:
    """Bit-reproducible round of a double to ``n`` decimal digits.

    ``floor(x * 10^n + 0.5) / 10^n`` — every step is an IEEE-754 double
    operation that Spark and DuckDB (and any engine) evaluate identically
    on identical input bits, so the result is bit-stable across engines,
    partition counts, and cluster sizes. Contrast ``F.round`` on a double:
    Spark routes through the shortest decimal rendering (HALF_UP on
    ``Double.toString``) while DuckDB rounds the binary value — and DuckDB
    can emit ``-0.0`` where Spark normalizes to ``+0.0``, which breaks
    bit-level value hashing even when the values compare equal. The floor
    form never produces ``-0.0`` for values that round to zero (the
    ``0 / 10^n`` quotient is ``+0.0``) and has no engine-dependent tie
    behavior. Semantics: half-ties round toward +inf (a documented engine
    contract; ties are measure-zero for real-valued quotients). NULL in,
    NULL out. Requires ``|x| * 10^n < 2^53``.
    """
    p = 10.0 ** n
    return F.floor(_c(col) * F.lit(p) + F.lit(0.5)).cast("double") / F.lit(p)


def oracle_fround(expr_sql: str, n: int) -> str:
    """DuckDB mirror of :func:`fround` (same IEEE ops, same bits)."""
    p = repr(10.0 ** n)
    return f"floor(({expr_sql}) * {p} + 0.5) / {p}"


def oracle_dsum(col_sql: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({col_sql} AS DECIMAL(27,6))), 2) AS DOUBLE)"
        f" AS {alias}"
    )


def oracle_davg(col_sql: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({col_sql} AS DECIMAL(27,6))), 2) AS DOUBLE)"
        f" / COUNT({col_sql}) AS {alias}"
    )


def oracle_dsum_product(a_sql: str, b_sql: str, alias: str) -> str:
    return (
        f"CAST(ROUND(SUM(CAST({a_sql} AS DECIMAL(12,2)) * "
        f"CAST({b_sql} AS DECIMAL(8,6))), 2) AS DOUBLE) AS {alias}"
    )
