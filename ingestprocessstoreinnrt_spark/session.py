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


def _scratch_dir() -> str | None:
    """Shuffle/spill scratch location (spark.local.dir).

    The sandbox's ext4-on-virtio disk charges ~0.3 s of create+sync
    fixed cost per kilobyte-scale shuffle file set (measured r13:
    a 5000-row groupBy exchange runs 0.79 s on disk vs 0.49 s on
    tmpfs, and dedup_incremental's SQL metrics showed 6-13 s of
    cumulative "shuffle write time" on sub-2 MB exchanges).  Shuffle
    scratch is recompute-on-loss ephemera, so tmpfs is safe; on a real
    cluster the same knob points at local NVMe (guide §2.1: local disk
    bandwidth for shuffle files can be the tighter limit).

    SPARK_GRAFT_LOCAL_DIR overrides (empty string = keep Spark's
    default); otherwise use /dev/shm when it is writable with >=16 GiB
    free — plenty for every bench scale (sf10's largest shuffles are
    single-digit GB) while never starving the heap of physical RAM.
    """
    env = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if env is not None:
        return env or None
    shm = "/dev/shm"
    try:
        st = os.statvfs(shm)
        if st.f_bavail * st.f_frsize >= 16 * 1024**3 and os.access(
            shm, os.W_OK
        ):
            return os.path.join(shm, "spark-graft-local")
    except OSError:
        pass
    return None


def builder(app_name: str = APP_NAME, shuffle_partitions: int | None = None):
    cpus = cpu_count()
    if shuffle_partitions is None:
        # Local single-JVM: one shuffle partition per core keeps every task
        # busy without tiny-partition scheduling overhead.  On a real
        # cluster this would be ~2-3x total cores; AQE coalesces down.
        shuffle_partitions = cpus
    scratch = _scratch_dir()
    b = (
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
        # Always use the serialized sort shuffle writer (one data file +
        # index per map task) instead of the bypass writer, which opens
        # one scratch file per reduce partition per map task and then
        # merges — 32 DiskBlockObjectWriter setups per task dominate
        # kilobyte-scale exchanges (r13 task metrics: 75-145 ms median
        # shuffle write per task even on tmpfs).  Interleaved A/B
        # microbench: tiny exchange 0.36 -> 0.30 s median, 5M-row
        # shuffle 1.61/0.96 -> 1.12/0.78 s — the sort path wins at both
        # ends here, and clusters with shuffle.partitions > 200 never
        # used the bypass writer anyway.
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
    )
    if scratch:
        b = b.config("spark.local.dir", scratch)
    return b


def get_spark(app_name: str = APP_NAME) -> SparkSession:
    spark = builder(app_name).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
