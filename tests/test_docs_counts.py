"""Documentation counts can't drift from the code (VERDICT r7 nit #3:
README said 63 headline queries while bench.py carried 65 — a class of
rot a regex pin kills permanently)."""

from __future__ import annotations

import os
import re

import bench
from realtimedatapipeline_8_project_spark.plans.registry import QUERIES

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_headline_count_matches_bench():
    with open(os.path.join(ROOT, "README.md")) as fh:
        m = re.search(r"(\d+) headline queries", fh.read())
    assert m, "README no longer states the headline count"
    assert int(m.group(1)) == len(bench.HEADLINE)


def test_coverage_registered_count_matches_registry():
    with open(os.path.join(ROOT, "COVERAGE.md")) as fh:
        m = re.search(r"every registered query \((\d+) as of round", fh.read())
    assert m, "COVERAGE no longer states the registered-query count"
    assert int(m.group(1)) == len(QUERIES)
