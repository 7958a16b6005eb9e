"""Embedding vector math as JVM-side higher-order functions.

No Python UDFs: dot products / norms over ``array<float>`` run inside
whole-stage codegen via ``zip_with`` + ``aggregate`` (SURVEY §2.13), so the
brute-force similarity scan stays distributed and vectorized at scale.
Elements are cast to double before multiplication so Spark and the DuckDB
oracle perform the identical IEEE-754 operation sequence (in-order
left-to-right accumulation over the array).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def oracle_dot(a_sql: str, b_sql: str) -> str:
    """DuckDB mirror of :func:`dot` — in-order fold over the zipped lists.

    ``list_dot_product`` may use a different accumulation order/precision,
    so we spell out the same left-to-right fold with ``list_reduce``."""
    prods = (
        f"list_transform(list_zip({a_sql}, {b_sql}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))"
    )
    return f"list_reduce(list_prepend(0.0, {prods}), (acc, x) -> acc + x)"


def oracle_l2_norm(a_sql: str) -> str:
    sq = f"list_transform({a_sql}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    return f"sqrt(list_reduce(list_prepend(0.0, {sq}), (acc, x) -> acc + x))"


def oracle_cosine(a_sql: str, b_sql: str) -> str:
    return (
        f"{oracle_dot(a_sql, b_sql)} / ({oracle_l2_norm(a_sql)} * {oracle_l2_norm(b_sql)})"
    )
