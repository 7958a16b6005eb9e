"""S2 JDBC batch scan, tested END TO END against the embedded Derby
engine Spark bundles (no external database needed — this leg is no
longer environment-gated): round-trip fidelity, the genuinely parallel
range-split read, predicate pushdown into the JDBC source, and the
reference's actual dataflow (enrichment against a JDBC dimension
snapshot) agreeing with the parquet path."""

from __future__ import annotations

import contextlib
import io
import shutil

import pytest

from pyspark.sql import functions as F

from realtimedatapipeline_8_project_spark.operators.enrich import (
    enrich_events,
    load_dim,
)
from realtimedatapipeline_8_project_spark.sources.tables import (
    load_jdbc_dim,
    load_table,
)

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, sf_small, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "dimdb")
    shutil.rmtree(db, ignore_errors=True)
    url = f"jdbc:derby:{db};create=true"
    (
        load_table(spark, sf_small, "customer")
        .write.format("jdbc")
        .option("url", url)
        .option("dbtable", "customer")
        .option("driver", DERBY)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_round_trip_matches_parquet(spark, sf_small, derby_url):
    pq = sorted(
        tuple(r) for r in load_table(spark, sf_small, "customer").collect()
    )
    jd = sorted(
        tuple(r)
        for r in load_jdbc_dim(
            spark, derby_url, "customer", user="", password=""
        ).collect()
    )
    assert jd == pq


def test_jdbc_parallel_read_splits_and_agrees(spark, sf_small, derby_url):
    """partitionColumn + bounds -> numPartitions real range-split reads
    (without them, Spark's JDBC read is single-partition no matter what
    numPartitions says — the reference's hidden quirk)."""
    plain = load_jdbc_dim(spark, derby_url, "customer", user="", password="")
    assert plain.rdd.getNumPartitions() == 1
    lo, hi = (
        load_table(spark, sf_small, "customer")
        .agg(F.min("c_custkey"), F.max("c_custkey"))
        .first()
    )
    par = load_jdbc_dim(
        spark,
        derby_url,
        "customer",
        user="",
        password="",
        num_partitions=4,
        partition_column="c_custkey",
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
    )
    assert par.rdd.getNumPartitions() == 4
    assert sorted(tuple(r) for r in par.collect()) == sorted(
        tuple(r) for r in plain.collect()
    )


def test_jdbc_predicate_pushdown(spark, sf_small, derby_url):
    dim = load_jdbc_dim(spark, derby_url, "customer", user="", password="")
    q = dim.where(F.col("c_custkey") == 42)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    p = buf.getvalue()
    assert "PushedFilters" in p and "C_CUSTKEY" in p.upper()
    assert q.count() == 1


def test_enrichment_against_jdbc_dim_equals_parquet_path(
    spark, sf_small, derby_url
):
    """The reference's actual dataflow: events enriched against the
    JDBC-read dimension snapshot must equal the parquet-dim result."""
    events = load_table(spark, sf_small, "events").limit(500)
    dim_pq = load_dim(spark, sf_small)
    dim_jdbc = load_jdbc_dim(
        spark, derby_url, "customer", user="", password=""
    ).select("c_custkey", "c_mktsegment", "c_acctbal")
    cols = ["event_id", "engagement_seconds", "engagement_pct"]
    a = sorted(
        tuple(r) for r in enrich_events(events, dim_pq).select(*cols).collect()
    )
    b = sorted(
        tuple(r)
        for r in enrich_events(events, dim_jdbc).select(*cols).collect()
    )
    assert a == b
