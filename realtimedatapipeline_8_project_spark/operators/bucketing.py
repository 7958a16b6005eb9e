"""Bucketed (co-located) joins — the shuffle-free strategy for the one
join that stays expensive at 100 TB: fact-to-fact (orders <-> lineitem).

Broadcast handles small dims; AQE handles skew; but joining two huge
tables on the same key otherwise shuffles both. Writing both sides
bucketed by the join key (same bucket count) lets Spark plan a
SortMergeJoin with NO Exchange on either side: each task reads matching
bucket files directly. On a real cluster this is set up once at ingest
("bucket by orderkey, 1024 buckets") and every subsequent join is free.

``write_bucketed`` + ``bucketed_join`` wrap the saveAsTable/bucketBy API;
the test asserts the join plan contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist a DataFrame as a bucketed managed table (parquet)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — Catalyst detects
    the matching output partitioning and plans a zero-shuffle SMJ."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on)
