"""Small-file compaction for streaming append tables.

A micro-batch append sink produces one-or-more files per trigger; at
2-second triggers that is ~43k files/day/table — metadata pressure and
scan overhead at 100 TB.  `compact_parquet_dir` rewrites a directory to
~target-sized files (content-preserving, verified by count), the
OPTIMIZE step a table maintenance job runs off the hot path.

Safety contract:
  * the table must be QUIESCED — no writer between stat and swap.  This
    is the CALLER's responsibility; the run narrows (but cannot close)
    the window by re-stat'ing the directory after the rewrite and
    aborting if anything changed.  A writer landing between that final
    stat and the swap rename still loses its files — stop the stream
    first.  An exclusive `._compact_lock` file serializes concurrent
    compactions of the same table and gives cooperating writers a
    marker to check; a stale lock after a hard crash in the swap window
    must be removed manually (after `recover_compaction`).
  * directories with a `_spark_metadata` file-sink log are refused:
    their readers resolve files through the log, which a rewrite cannot
    preserve.  Compaction targets foreachBatch/batch-written tables
    (everything streaming/upsert.py and append-as-parquet produce is
    fine once the query is stopped and the log absent).
  * Hive-partitioned layouts (key=value subdirs) are refused rather
    than silently flattened.
  * the two-rename swap is not atomic; a crash between renames leaves
    `._compact_old` intact, and the next run (or `recover_compaction`)
    restores it.  Stale temp dirs from crashed runs are cleaned on
    entry, never left to wedge future compactions.
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


def _tmp(path: str) -> str:
    return path.rstrip("/") + "._compact_tmp"


def _old(path: str) -> str:
    return path.rstrip("/") + "._compact_old"


def _lock(path: str) -> str:
    return path.rstrip("/") + "._compact_lock"


def recover_compaction(path: str) -> bool:
    """Restore a table lost to a crash between the swap renames (old
    exists, path missing).  Returns True if a recovery happened."""
    if os.path.exists(_old(path)) and not os.path.exists(path):
        os.rename(_old(path), path)
        return True
    return False


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite `path` to ceil(total/target) files; returns the new file
    count (0 = nothing to do)."""
    recover_compaction(path)
    # stale leftovers from a crashed run must not wedge this one
    shutil.rmtree(_tmp(path), ignore_errors=True)
    shutil.rmtree(_old(path), ignore_errors=True)

    if not os.path.isdir(path):
        return 0
    if os.path.exists(os.path.join(path, "_spark_metadata")):
        raise ValueError(
            f"{path} is a streaming file-sink output (_spark_metadata "
            "present): its readers resolve files through the sink log, "
            "which compaction cannot preserve. Stop the query and write "
            "via foreachBatch, or compact into a new table instead."
        )
    for entry in os.listdir(path):
        if "=" in entry and os.path.isdir(os.path.join(path, entry)):
            raise ValueError(
                f"{path} is Hive-partitioned ({entry}); flat compaction "
                "would destroy the layout — compact per-partition instead."
            )

    n_before, total = parquet_file_stats(path)
    if total == 0:
        return 0
    n_files = max(1, -(-total // target_bytes))  # ceil

    df = spark.read.parquet(path)
    before = df.count()
    df.coalesce(n_files).write.mode("overwrite").parquet(_tmp(path))

    after = spark.read.parquet(_tmp(path)).count()
    if after != before:
        shutil.rmtree(_tmp(path), ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch: {before} -> {after}"
        )
    # exclusive lock over the stat-through-swap window: serializes
    # concurrent compactions and marks the table for cooperating
    # writers.  It cannot stop an arbitrary external writer — the
    # quiescence contract remains the caller's (see module docstring).
    try:
        lock_fd = os.open(_lock(path), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        shutil.rmtree(_tmp(path), ignore_errors=True)
        raise RuntimeError(
            f"{_lock(path)} exists: another compaction holds the lock "
            "(or crashed in the swap window — run recover_compaction "
            "and remove the lock file)."
        )
    try:
        # quiescence check: if a writer landed anything since the first
        # stat, abort rather than delete its data in the swap
        if parquet_file_stats(path) != (n_before, total):
            shutil.rmtree(_tmp(path), ignore_errors=True)
            raise RuntimeError(
                f"{path} changed during compaction (live writer?); aborted "
                "without modifying the table. Quiesce the stream first."
            )

        os.rename(path, _old(path))
        try:
            os.rename(_tmp(path), path)
        except OSError:
            os.rename(_old(path), path)  # roll back, table never missing
            raise
        shutil.rmtree(_old(path), ignore_errors=True)
    finally:
        os.close(lock_fd)
        os.unlink(_lock(path))
    return n_files
