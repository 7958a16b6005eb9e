"""Opt-in robustness sweep (``pytest -m sweep``): EVERY registered query
— not just the benched headline set — executes once at sf0.1. The bench
covers timing for its headline subset; this catches the other failure
mode: a non-headline query that works at the small parity fixtures but
breaks (OOM, pathological plan, overflow) at the larger scale. Untimed
on purpose — run it alongside nothing and read failures, not seconds.

First committed after the round-7 manual sweep caught the serialized
SimHash sketch pass (one parquet row group in, CPU-bound stage on 2 of
32 cores) that the sf0.001/sf0.01 suites could never surface."""

from __future__ import annotations

import os

import pytest

from realtimedatapipeline_8_project_spark.plans.registry import EARMARKS, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.1")


@pytest.mark.sweep
@pytest.mark.parametrize("name", list(QUERIES))
def test_query_runs_at_sweep_scale(spark, name):
    QUERIES[name](spark, SF_DIR).count()
    spark.catalog.clearCache()


@pytest.mark.sweep
@pytest.mark.parametrize("name", sorted(EARMARKS))
def test_earmark_runs_at_sweep_scale(spark, name):
    """The permanent earmark tier sweeps at sf0.1 too (r14): scale-only
    breakage in an unregistered operator is still breakage."""
    EARMARKS[name][0](spark, SF_DIR).count()
    spark.catalog.clearCache()
