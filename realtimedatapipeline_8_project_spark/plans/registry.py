"""Central query registry: every implemented operator from SURVEY.md §2 as
a (spark, sf_dir) -> DataFrame callable, plus the DuckDB oracle SQL that
defines its semantics (None => rows-only check for non-SQL-expressible or
approximate operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    aggregates,
    asof,
    dedup,
    enrich,
    multimodal,
    pandas_ops,
    range_join,
    reference_pipeline,
    relational,
    sampling,
    scale,
    similarity,
    sketches,
    sql_surface,
    text_analysis,
    windows,
)

_MODULES = (
    enrich,
    reference_pipeline,
    relational,
    aggregates,
    windows,
    dedup,
    text_analysis,
    similarity,
    multimodal,
    sql_surface,
    scale,
    pandas_ops,
    asof,
    range_join,
    sampling,
    sketches,
)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

for _m in _MODULES:
    for _name, (_fn, _sql) in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name: {_name}")
        QUERIES[_name] = _fn
        if _sql is not None:
            ORACLES[_name] = _sql
