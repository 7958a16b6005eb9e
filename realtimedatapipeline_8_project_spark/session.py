"""SparkSession factory with the engine's standard configuration.

Reference knobs reproduced (SURVEY.md §2.12/§4): Kryo serializer
(stream-processor.py:202), AQE + partition coalescing (:203-204). Shuffle
partitioning is sized for the local test harness but the same code scales to
a multi-executor cluster by overriding ``spark.sql.shuffle.partitions`` (AQE
coalesces small post-shuffle partitions at runtime anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "realtimedatapipeline-8-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Defaults: ``local[$SPARK_GRAFT_CPUS or *]``, AQE enabled, Kryo, Arrow
    for pandas-UDF exchange, 32 shuffle partitions (matches local[32]; at
    cluster scale this is overridden to ~2-3x total cores and AQE coalesces).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet scans: keep vectorized reader + pushdown on (defaults, but
        # pinned here because the bench depends on them).
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        # TIMESTAMP(NANOS) parquet columns read as long (sources/tables.py
        # normalizes); only consulted for nanos files, pinned here so
        # loaders never need to mutate an engine-built session.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # 12g default: the single-JVM bench session runs 40+ query shapes
        # back to back; headroom keeps GC pauses out of per-query timings
        # (the box has 128 GiB)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        # 40+ whole-stage-codegen shapes overflow the JVM's default 240m
        # code cache mid-session, deoptimizing later queries (measured
        # ~10% on the iterative ones); reserve enough for the full suite
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
