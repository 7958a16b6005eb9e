"""Driver-harness compatibility guards (schema-only; no query execution):

1. every oracle-bearing query must emit only scalar columns (no
   map/array/struct) — the driver's result comparator canonicalizes rows
   into hashable tuples, and a complex-typed cell crashes it (round-1
   json_as_map regression);
2. no oracle may produce a HUGEINT column — DuckDB silently widens
   SUM(BIGINT) to int128, which the driver's value-hash canonicalizes
   differently from Spark's LongType even when the values are identical
   (round-2 sparse_doc_cosine hash-fail). ``CAST(SUM(..) AS BIGINT)``.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from realtimedatapipeline_8_project_spark.plans.registry import ORACLES, QUERIES

from .oracle_harness import duck_connection


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_query_output_is_scalar_only(spark, sf_small, name):
    schema = QUERIES[name](spark, sf_small).schema
    complex_cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name} exposes complex-typed columns {complex_cols} to the "
        "driver comparator"
    )


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duck_connection(sf_small)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_no_hugeint(duck, name):
    # DESCRIBE plans the query without running it — cheap per oracle.
    cols = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    huge = [c[0] for c in cols if "HUGEINT" in str(c[1]).upper()]
    assert not huge, (
        f"{name} oracle yields HUGEINT columns {huge}; add "
        "CAST(... AS BIGINT) so both engines hash 64-bit values"
    )
