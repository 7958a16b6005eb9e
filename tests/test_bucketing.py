"""Co-located bucketed join: correctness + the zero-shuffle plan property."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from realtimedatapipeline_8_project_spark.sources.tables import load_table


def _cleanup(spark):
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_bucketed_join_has_no_exchange_and_is_correct(spark, sf_small):
    # managed tables land in ./spark-warehouse (gitignored); the in-memory
    # catalog forgets tables across sessions while their directories persist,
    # so clean both before and after
    _cleanup(spark)
    orders = load_table(spark, sf_small, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey", "l_quantity")

    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        sort_col="o_orderkey",
    )

    # at fixture scale Catalyst would broadcast; disable it so the plan shows
    # what happens when BOTH sides are too big to broadcast — the case
    # bucketing exists for
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle either side"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")

    # correctness vs the plain join
    plain = orders.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert joined.count() == plain.count()
    got = joined.agg(F.sum(F.col("l_quantity").cast("decimal(27,6)"))).collect()[0][0]
    want = plain.agg(F.sum(F.col("l_quantity").cast("decimal(27,6)"))).collect()[0][0]
    assert got == want

    _cleanup(spark)


def test_bucketed_pagerank_iteration_join_is_exchange_free(spark, sf_small):
    """The scale claim from graph.py made checkable: with the degree-
    annotated edge table bucketed by src, a 2-iteration rank plan contains
    EXCHANGES ONLY for the per-round message aggregation (hash on dst) —
    the rank join itself never shuffles either side. The non-bucketed
    path, by contrast, must exchange the edge table for its joins."""
    import re

    from realtimedatapipeline_8_project_spark.operators.graph import (
        _edges,
        pagerank_bucketed,
    )

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ranks = pagerank_bucketed(
            spark, _edges(spark, sf_small), "pr_plan_test", iters=2
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ranks.explain("formatted")
        plan = buf.getvalue()
        n_exchanges = len(
            re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE)
        )
        assert n_exchanges == 2, f"want 1 exchange per iteration, plan:\n{plan}"
        assert "hashpartitioning(dst" in plan
        assert "hashpartitioning(src" not in plan, (
            "edge side of the rank join must come from bucket files, "
            "not a shuffle"
        )
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.sql("DROP TABLE IF EXISTS pr_plan_test")
