"""Empty-input robustness: every registered batch query must plan and
execute against zero-row tables (a freshly-provisioned lake, an empty
partition, a filtered-out date range) without raising — returning an
empty (or empty-aggregate) result, never crashing. The reference's
pipeline guards empty micro-batches (F3); this is the batch analog."""

from __future__ import annotations

import pytest

from realtimedatapipeline_8_project_spark.plans.registry import QUERIES
from realtimedatapipeline_8_project_spark.sources.tables import load_table

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def empty_sf(spark, sf_small, tmp_path_factory):
    base = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        df = load_table(spark, sf_small, t)
        df.limit(0).write.parquet(str(base / f"{t}.parquet"))
    return str(base)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf, name):
    df = QUERIES[name](spark, empty_sf)
    rows = df.collect()
    # global aggregates may emit one all-null/zero row and fixed-shape
    # reports (per-column profile, per-relation DQ) a constant handful;
    # everything else must be empty — either way, no exception and no
    # data-dependent output.
    assert len(rows) <= 8
