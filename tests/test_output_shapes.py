"""Driver-harness compatibility guard: every oracle-bearing query must
emit only scalar columns (no map/array/struct) — the driver's result
comparator canonicalizes rows into hashable tuples, and a complex-typed
cell crashes it (round-1 json_as_map regression). Schema-only check: no
execution."""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from realtimedatapipeline_8_project_spark.plans.registry import ORACLES, QUERIES


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
