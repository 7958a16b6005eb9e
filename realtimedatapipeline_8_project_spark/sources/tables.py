"""Batch table loaders over the driver parquet fixtures (TESTDATA.md).

The reference reads its dimension via a JDBC snapshot with manual column
pruning (stream-processor.py:254-266); in our engine the same operator is a
parquet scan and pruning/pushdown is left to Catalyst (SURVEY.md §4) — a
``.select``/``.filter`` downstream reaches the scan as ReadSchema /
PushedFilters. JDBC remains a drop-in alternative behind the same call.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Columnar parquet scan; Catalyst prunes.

    ``events.parquet`` fixtures have shipped with three different physical
    encodings of ``ts`` across driver generations, and every downstream
    operator assumes a session-TZ ``TimestampType`` (``unix_micros`` etc.
    reject TIMESTAMP_NTZ):

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it by default; we
      read nanos as long (``nanosAsLong``) and convert with integer ``div``
      — the same truncation DuckDB applies — keeping the scan vectorized.
    - TIMESTAMP_MICROS(isAdjustedToUTC=false): Spark 4.x reads this as
      TIMESTAMP_NTZ; we cast to ``timestamp``. The session TZ is pinned UTC
      (session.py), so wall-clock values — and all DuckDB oracles — are
      unchanged.
    - TIMESTAMP_MICROS(isAdjustedToUTC=true): already session-TZ
      TimestampType; passes through untouched."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        from pyspark.sql import functions as F

        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql() use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_jdbc_dim(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    num_partitions: int = 4,
    fetchsize: int = 10_000,
) -> DataFrame:
    """JDBC dimension snapshot — same options as the reference
    (stream-processor.py:254-263: fetchsize=10000, numPartitions=4).
    Optional path; tests use parquet fixtures instead."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("fetchsize", str(fetchsize))
        .option("numPartitions", str(num_partitions))
        .load()
    )
