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


def _parquet_has_nanos_ts(path: str, column: str = "ts") -> bool:
    """True iff the parquet file/dir stores ``column`` as TIMESTAMP(NANOS).

    Footer-only pyarrow probe (no data pages read) so the Spark-side
    ``nanosAsLong`` legacy conf is touched ONLY for files that need it —
    there is no per-read datasource option for it in Spark 4.x
    (ParquetOptions: mergeSchema/compression/rebase modes only)."""
    try:
        import pyarrow.dataset as ds
        import pyarrow as pa

        field = ds.dataset(path, format="parquet").schema.field(column)
        return pa.types.is_timestamp(field.type) and field.type.unit == "ns"
    except Exception:
        # unknown layout/column: leave session conf untouched; the plain
        # read below surfaces any real incompatibility
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Columnar parquet scan; Catalyst prunes.

    ``events.parquet`` fixtures have shipped with three different physical
    encodings of ``ts`` across driver generations, and every downstream
    operator assumes a session-TZ ``TimestampType`` (``unix_micros`` etc.
    reject TIMESTAMP_NTZ):

    - TIMESTAMP(NANOS): Spark's vectorized reader rejects it by default; we
      read nanos as long (``nanosAsLong``) and convert with integer ``div``
      — the same truncation DuckDB applies — keeping the scan vectorized.
      The legacy conf has no read-option-scoped form, so it is latched on
      the session — but only after a footer probe proves this file actually
      stores nanos (a micros-encoded load never mutates session state).
      Engine-built sessions pin the conf at build time (session.py); the
      latch here covers vanilla sessions such as the driver's.
    - TIMESTAMP_MICROS(isAdjustedToUTC=false): Spark 4.x reads this as
      TIMESTAMP_NTZ; we cast to ``timestamp``. The session TZ is pinned UTC
      (session.py), so wall-clock values — and all DuckDB oracles — are
      unchanged.
    - TIMESTAMP_MICROS(isAdjustedToUTC=true): already session-TZ
      TimestampType; passes through untouched."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        if _parquet_has_nanos_ts(path):
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
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    driver: str | None = None,
) -> DataFrame:
    """JDBC dimension snapshot — same options as the reference
    (stream-processor.py:254-263: fetchsize=10000, numPartitions=4).

    NOTE the reference quirk its options hide: Spark's JDBC source
    ignores ``numPartitions`` on read unless ``partitionColumn`` +
    bounds are also given — the reference's snapshot is actually a
    single-partition read. Pass ``partition_column``/``lower_bound``/
    ``upper_bound`` for the genuinely parallel scan (N range-split
    queries); tested end-to-end against the embedded Derby engine
    bundled with Spark (tests/test_jdbc_source.py), so this leg is no
    longer environment-gated."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("fetchsize", str(fetchsize))
        .option("numPartitions", str(num_partitions))
    )
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()
