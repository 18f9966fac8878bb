"""Mutable keyed table on plain parquet — the serving-layer role Kudu
plays in the reference (upsert by primary key, hash-partitioned:
`DISTRIBUTE BY HASH (vender_id) INTO 3 BUCKETS`,
create_ny_taxi_yellow_trip_table.impala:22; insert-vs-update chosen per
row, NyTaxiYellowTripStreaming.scala:223-229).

Design for 100 TB:
  * rows live under hash-bucket partitions (`_bucket=NN/`); an upsert
    rewrites ONLY the buckets its keys touch (per-write dynamic
    partition overwrite), so cost scales with the update's key spread,
    not table size.  Bucket count is the knob — same role as Kudu's
    hash buckets.
  * point lookups filter on the derivable `_bucket` value, so Catalyst
    partition-prunes to one directory.
  * exactly-once under micro-batch replay: `apply_batch` is guarded by
    a batch-id ledger AND a per-batch undo log — before touching the
    table it snapshots the affected buckets to `_pending/<batch>/`; a
    crash anywhere before the applied-marker lands is rolled back from
    the snapshot on the next call, so a redelivered batch replays
    against the pre-batch state (no double-merge).  This replaces the
    reference's swallow-duplicate-key-errors approach
    (NyTaxiYellowTripStreaming.scala:298-313).

Filesystem scope: all ledger/undo bookkeeping lives behind the
LocalFSTxnLog interface (is_applied/mark_applied, begin/
snapshot_buckets/commit, rollback_incomplete) — driver-local
filesystem operations, correct for the local/NFS paths of this
environment.  On an object store (s3a://...) slot a transactional
table format in its place; LocalFSTxnLog's docstring maps each method
onto the Delta/Iceberg equivalent.  The DataFrame read/write calls
themselves are already URI-agnostic.

The reference's per-row insert-vs-update flag dance collapses into
last-write-wins MERGE by key (deterministic: ties inside one batch are
broken by a stable row hash); a `merge_fn` hook supports aggregate
merging (running entities) instead of row replacement.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class LocalFSTxnLog:
    """The upsert table's transaction log: an applied-batch ledger plus
    a per-batch undo (bucket snapshot) log, as driver-local filesystem
    operations.  This class is the ONLY place UpsertTable touches the
    filesystem outside DataFrame reads/writes, so swapping the backend
    swaps the consistency story without touching merge logic.

    Mapping onto a transactional table format (the object-store path):
      * is_applied/mark_applied  -> Delta's idempotent-write txn action
        (`txnAppId`/`txnVersion`) or an Iceberg snapshot summary
        property: commit metadata, atomic with the data commit.
      * snapshot_buckets + rollback_incomplete -> unnecessary: the
        format's snapshot isolation means a crashed write simply never
        commits, and replay starts from the last committed snapshot
        (what the undo log reconstructs by hand on plain parquet).
      * dynamic partition overwrite -> `replaceWhere` (Delta) /
        overwrite-by-filter (Iceberg), committed atomically.
    On a local/NFS filesystem this implementation is correct as-is;
    on s3a:// it is not (rename/list consistency), use a table format.

    Protocol per batch key (see apply_batch):
      begin(key) -> [record_fresh_table | snapshot_buckets] ->
      <table write> -> commit(key); rollback_incomplete() at entry
      undoes any batch that began but never committed.
    """

    def __init__(self, root: str):
        self.root = root
        self.ledger_dir = os.path.join(root, "_applied_batches")
        self.pending_dir = os.path.join(root, "_pending")
        self.intent_dir = os.path.join(root, "_intents")
        self.lock_path = os.path.join(root, "_commit_lock")

    # -- applied-batch ledger ----------------------------------------

    def is_applied(self, key: str) -> bool:
        return os.path.exists(os.path.join(self.ledger_dir, key))

    def mark_applied(self, key: str) -> None:
        os.makedirs(self.ledger_dir, exist_ok=True)
        tmp = os.path.join(self.ledger_dir, f".{key}.tmp")
        with open(tmp, "w") as f:
            f.write("")
        os.rename(tmp, os.path.join(self.ledger_dir, key))

    # -- per-batch undo log ------------------------------------------

    def _pdir(self, key: str) -> str:
        return os.path.join(self.pending_dir, key)

    def begin(self, key: str) -> None:
        """Open a fresh undo entry for the batch (discarding any stale
        attempt's leftovers)."""
        shutil.rmtree(self._pdir(key), ignore_errors=True)
        os.makedirs(self._pdir(key), exist_ok=True)

    def record_fresh_table(self, key: str) -> None:
        """The batch is about to CREATE the table; undo = drop it."""
        open(os.path.join(self._pdir(key), "_fresh_table"), "w").close()

    def snapshot_buckets(
        self, key: str, data_dir: str, buckets: list
    ) -> None:
        """Copy the affected bucket partitions into the undo entry
        (absent buckets are recorded so rollback can delete ones the
        write creates), then seal with the `_snapshot_complete`
        sentinel — only a sealed snapshot may ever be restored."""
        pdir = self._pdir(key)
        for b in buckets:
            src = os.path.join(data_dir, f"_bucket={b}")
            if os.path.isdir(src):
                shutil.copytree(src, os.path.join(pdir, f"_bucket={b}"))
            else:
                open(os.path.join(pdir, f"_absent_bucket={b}"), "w").close()
        open(os.path.join(pdir, "_snapshot_complete"), "w").close()

    def commit(self, key: str) -> None:
        """Applied-marker first, then drop the undo entry: a crash
        between the two replays as already_applied (marker wins)."""
        self.mark_applied(key)
        shutil.rmtree(self._pdir(key), ignore_errors=True)

    def rollback_incomplete(self, data_dir: str) -> None:
        """Undo any batch that wrote data but never committed (crash
        window): restore the snapshotted buckets.

        A snapshot is only trusted if it carries the
        `_snapshot_complete` sentinel, written after the copy loop and
        before the table write begins.  A pending dir without it means
        the crash hit mid-snapshot — the live table was never touched,
        and restoring the partial copy would LOSE rows — so it is
        simply discarded."""
        if not os.path.isdir(self.pending_dir):
            return
        for batch in os.listdir(self.pending_dir):
            pdir = os.path.join(self.pending_dir, batch)
            if self.is_applied(batch):
                shutil.rmtree(pdir, ignore_errors=True)
                continue
            if os.path.exists(os.path.join(pdir, "_fresh_table")):
                # the crashed batch CREATED the table; undo = drop it
                shutil.rmtree(data_dir, ignore_errors=True)
            elif not os.path.exists(
                os.path.join(pdir, "_snapshot_complete")
            ):
                pass  # partial snapshot, table untouched: discard only
            else:
                for entry in os.listdir(pdir):
                    if entry == "_snapshot_complete":
                        continue
                    if entry.startswith("_absent_bucket="):
                        # the crashed write CREATED this bucket; undo =
                        # remove it (snapshot-restore alone would leave
                        # its half-applied rows to be double-merged)
                        b = entry.split("=", 1)[1]
                        shutil.rmtree(
                            os.path.join(data_dir, f"_bucket={b}"),
                            ignore_errors=True,
                        )
                        continue
                    dst = os.path.join(data_dir, entry)
                    shutil.rmtree(dst, ignore_errors=True)
                    shutil.move(os.path.join(pdir, entry), dst)
            shutil.rmtree(pdir, ignore_errors=True)

    # -- multi-writer protocol ---------------------------------------
    #
    # Two gates make concurrent drivers safe (the Delta `_delta_log`
    # shape at toy scale — serialized atomic commits):
    #   * per-batch CLAIM: O_CREAT|O_EXCL creation of _intents/<key> —
    #     POSIX-atomic, exactly one winner per batch id; the loser
    #     waits for the winner's ledger marker (batch applied) or the
    #     claim's release (winner rolled back; retry).  This is what
    #     makes replay-racing writers unable to double-apply a batch.
    #   * table-level COMMIT LOCK: O_EXCL creation of _commit_lock
    #     around the read-merge-snapshot-write-commit critical section,
    #     so two writers applying DIFFERENT batches cannot interleave a
    #     bucket read with the other's bucket overwrite (plain parquet
    #     has no snapshot isolation to hide behind).  Delta replaces
    #     this mutex with optimistic commit + retry; on a single table
    #     directory the mutex is the honest equivalent.
    # Both files carry the writer id.  A claim/lock left by a CRASHED
    # writer blocks successors by design (liveness over safety is the
    # wrong trade for a ledger); `reclaim_stale` is the explicit
    # operator/supervisor entrypoint that breaks files older than
    # max_age after rollback_incomplete has restored the table.

    def try_claim(self, key: str, writer_id: str) -> bool:
        """Atomically claim the batch for writer_id.  True if this call
        won the claim OR the claim is already held by writer_id (a
        restarted writer resumes its own in-flight batch)."""
        os.makedirs(self.intent_dir, exist_ok=True)
        p = os.path.join(self.intent_dir, key)
        try:
            fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(p) as f:
                    return f.read() == writer_id
            except OSError:
                return False
        with os.fdopen(fd, "w") as f:
            f.write(writer_id)
        return True

    def claim_held(self, key: str) -> bool:
        return os.path.exists(os.path.join(self.intent_dir, key))

    def release_claim(self, key: str) -> None:
        with contextlib.suppress(FileNotFoundError):
            os.unlink(os.path.join(self.intent_dir, key))

    @contextlib.contextmanager
    def table_lock(
        self, writer_id: str, timeout: float = 60.0, poll: float = 0.02
    ):
        """Mutual exclusion over the table's commit critical section."""
        deadline = time.monotonic() + timeout
        while True:
            try:
                fd = os.open(
                    self.lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY
                )
                break
            except FileExistsError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"table commit lock held past {timeout}s "
                        f"(holder: {self._lock_holder()!r}); if that "
                        "writer is dead, run reclaim_stale()"
                    ) from None
                time.sleep(poll)
        try:
            with os.fdopen(fd, "w") as f:
                f.write(writer_id)
            yield
        finally:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(self.lock_path)

    def _lock_holder(self) -> str | None:
        try:
            with open(self.lock_path) as f:
                return f.read()
        except OSError:
            return None

    def reclaim_stale(self, data_dir: str, max_age_sec: float) -> None:
        """Operator/supervisor recovery from a crashed writer: break
        the commit lock and any uncommitted claims older than
        max_age_sec, then roll back the half-applied attempt from the
        undo log.  NEVER called automatically — a slow-but-alive writer
        must not be usurped."""
        now = time.time()

        def _stale(p: str) -> bool:
            try:
                return now - os.stat(p).st_mtime > max_age_sec
            except OSError:
                return False

        if _stale(self.lock_path):
            with contextlib.suppress(FileNotFoundError):
                os.unlink(self.lock_path)
        if os.path.isdir(self.intent_dir):
            for key in os.listdir(self.intent_dir):
                p = os.path.join(self.intent_dir, key)
                if self.is_applied(key) or _stale(p):
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(p)
        # a compactor that died between its swap renames left the
        # bucket missing from data/ with the backup in scratch —
        # restore BEFORE rollback so no later writer sees an
        # empty-looking bucket and rewrites it batch-only (ADVICE r9)
        from ingestprocessstoreinnrt_spark.streaming.compact import (
            recover_compaction_scratch,
        )

        recover_compaction_scratch(
            data_dir,
            os.path.join(self.root, "_compact_scratch"),
            break_locks=True,  # operator declared all writers dead
        )
        self.rollback_incomplete(data_dir)


# How long table open waits for a live compactor to clear its swap
# window (two renames — milliseconds) before declaring a locked-and-
# missing bucket a crash and raising toward reclaim_stale.
OPEN_RECOVERY_GRACE_SEC = 2.0


class UpsertTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        num_buckets: int = 16,
        _open_grace_sec: float | None = None,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.num_buckets = num_buckets
        self.txn_log = LocalFSTxnLog(path)
        # layout aliases (tests and external tooling inspect these)
        self._ledger = self.txn_log.ledger_dir
        self._pending = self.txn_log.pending_dir
        # table-open recovery (ADVICE r9/r10/r11): restore any bucket a
        # crashed compactor left stranded in _compact_scratch before a
        # writer can mistake it for empty — without racing a LIVE
        # compactor's swap, and without letting READERS silently see
        # the table minus a bucket a DEAD compactor stranded.  One
        # isdir stat when no compaction ever ran.
        self._open_recover(grace_sec=_open_grace_sec)

    def _open_recover(self, grace_sec: float | None = None) -> None:
        """Crash recovery at table open, safe against a live compactor.

        Every documented compaction of this table swaps buckets INSIDE
        the table commit lock (compact_upsert_table), so holding that
        lock here proves no compactor is mid-swap:
          * lock acquired -> restore everything recover_compaction_scratch
            finds, including buckets whose per-bucket ._compact_lock is
            present (their holder provably died: a live one would be
            holding the commit lock we now hold).  break_locks clears
            the dead holder's bucket locks so the next compaction isn't
            wedged.
          * lock busy -> restore only unlocked leftovers (skip_locked,
            ADVICE r10 — never race a live swap), then verify no bucket
            is left both locked and MISSING from data/.  That state is
            a live compactor's millisecond swap window or a crash; poll
            for `grace_sec`, and if it persists raise toward
            reclaim_stale rather than let read-only consumers silently
            serve a table minus a whole bucket (ADVICE r11 medium —
            readers take no lock, so open is their only checkpoint).
        """
        from ingestprocessstoreinnrt_spark.streaming.compact import (
            recover_compaction_scratch,
            stranded_locked_partitions,
        )

        if grace_sec is None:
            grace_sec = OPEN_RECOVERY_GRACE_SEC
        scratch = os.path.join(self.path, "_compact_scratch")
        if not os.path.isdir(scratch):
            # fresh table / never compacted: nothing to recover, and
            # the table root may not even exist yet — taking the
            # commit lock here would os.open into a missing directory
            return
        try:
            with self.txn_log.table_lock("table-open-recovery", timeout=0.0):
                recover_compaction_scratch(
                    self._data(), scratch, break_locks=True
                )
            return
        except TimeoutError:
            pass  # commit lock held: live writer/compactor, or a crash
        recover_compaction_scratch(self._data(), scratch, skip_locked=True)
        deadline = time.monotonic() + grace_sec
        while True:
            stranded = stranded_locked_partitions(self._data(), scratch)
            if not stranded:
                return
            if time.monotonic() > deadline:
                raise RuntimeError(
                    f"table {self.path}: partition(s) {stranded} are "
                    "missing from data/ with a compaction backup and "
                    "bucket lock still in _compact_scratch, and the "
                    "table commit lock is held (holder: "
                    f"{self.txn_log._lock_holder()!r}).  A compactor "
                    "crashed (or stalled) mid-swap; reading now would "
                    "silently drop those buckets.  If the holder is "
                    "dead, run txn_log.reclaim_stale() to restore."
                )
            time.sleep(0.05)

    # -- storage ------------------------------------------------------------

    def _data(self) -> str:
        return os.path.join(self.path, "data")

    def _bucket_col(self):
        return F.pmod(
            F.xxhash64(*self.key_cols), F.lit(self.num_buckets)
        ).cast("int")

    def exists(self) -> bool:
        return os.path.exists(self._data())

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self._data()).drop("_bucket")

    def _affected_buckets(self, keys_df: DataFrame) -> list[int]:
        # reuse a materialized _bucket column when the frame carries one
        # (same deterministic derivation, no hash recompute)
        col = (
            F.col("_bucket")
            if "_bucket" in keys_df.columns
            else self._bucket_col()
        )
        return [
            r[0] for r in keys_df.select(col.alias("b")).distinct().collect()
        ]

    def read_bucket_pruned(
        self, keys_df: DataFrame, buckets: list[int] | None = None
    ) -> DataFrame:
        """Read only the bucket partitions containing the given keys.
        Pass `buckets` when the caller already collected them — the
        collect is one Spark job, and a micro-batch should pay it
        once."""
        if buckets is None:
            buckets = self._affected_buckets(keys_df)
        df = self.spark.read.parquet(self._data())
        return df.filter(F.col("_bucket").isin(buckets)).drop("_bucket")

    def init(self, df: DataFrame) -> None:
        """Create/replace the whole table from a snapshot (bootstrap,
        J1).  Static overwrite on the directory — replaces every bucket
        regardless of session conf."""
        (
            df.withColumn("_bucket", self._bucket_col())
            .repartition("_bucket")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy("_bucket")
            .parquet(self._data())
        )

    # -- upsert -------------------------------------------------------------

    def upsert(
        self,
        new_rows: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    ) -> None:
        """MERGE by key.  Default: last-write-wins row replacement
        (deterministic under in-batch duplicate keys via a stable row
        hash).  With merge_fn(current_subset, new_rows) -> merged:
        aggregate merging.  Only the buckets present in `new_rows` are
        rewritten (per-write dynamic partition overwrite — session conf
        untouched)."""
        if not self.exists():
            if merge_fn is not None:
                merged = merge_fn(None, new_rows)
            else:
                # same deterministic-dedup contract as the merge path:
                # in-batch duplicate keys must not persist multiple rows
                merged = self._lww_dedup_new(new_rows)
            self.init(merged)
            return

        new_rows = new_rows.cache()
        merged = self._finalize(self._merge_existing(new_rows, merge_fn))
        self._check_merge_buckets(merged, new_rows, merge_fn)
        self._write_prebucketed(merged)
        new_rows.unpersist()

    def _lww_dedup_new(self, new_rows: DataFrame) -> DataFrame:
        """One row per key among new rows only (no current table): ties
        broken by the same stable whole-row hash as the merge path."""
        w = Window.partitionBy(*self.key_cols).orderBy(F.col("_tie").desc())
        return (
            new_rows.withColumn("_tie", F.xxhash64(*new_rows.columns))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_tie", "_rn")
        )

    def _merge_existing(
        self,
        new_rows: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None,
        new_buckets: list[int] | None = None,
    ) -> DataFrame:
        current = self.read_bucket_pruned(new_rows, new_buckets)
        if merge_fn is not None:
            return merge_fn(current, new_rows)
        # new rows win over current; ties among new rows broken by a
        # deterministic hash of the whole row so reruns of the same
        # input persist the same row
        tie = F.xxhash64(*new_rows.columns)
        w = Window.partitionBy(*self.key_cols).orderBy(
            F.col("_pri").desc(), F.col("_tie").desc()
        )
        return (
            current.withColumn("_pri", F.lit(0))
            .withColumn("_tie", F.lit(0).cast("long"))
            .unionByName(
                new_rows.withColumn("_pri", F.lit(1)).withColumn("_tie", tie)
            )
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_pri", "_tie", "_rn")
        )

    def _check_merge_buckets(
        self,
        merged: DataFrame,
        new_rows: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None,
    ) -> None:
        """A merge_fn emitting keys that hash outside the batch's
        buckets would have its rows land via dynamic overwrite into
        buckets that were never read — silently dropping the unread
        rows already there.  Fail fast instead (metadata-scale check:
        <= num_buckets distinct values per side)."""
        if merge_fn is None:
            return  # LWW keeps exactly the batch's keys
        extra = set(self._affected_buckets(merged)) - set(
            self._affected_buckets(new_rows)
        )
        if extra:
            raise ValueError(
                "merge_fn emitted keys hashing to buckets "
                f"{sorted(extra)} outside the batch's buckets; those "
                "buckets were not read, so writing would drop their "
                "existing rows. merge_fn must only return keys drawn "
                "from the batch or the current subset it was given."
            )

    def _finalize(self, merged: DataFrame) -> DataFrame:
        """Bucket-assign + repartition + materialize the merge output.
        The checkpoint serves two masters with ONE shuffle: it breaks
        the read-overwrite hazard (`merged` reads the same parquet
        partitions the write replaces), and it materializes the final
        partition layout so the write itself is shuffle-free."""
        return (
            merged.withColumn("_bucket", self._bucket_col())
            .repartition("_bucket")
            .localCheckpoint(eager=True)
        )

    def _write_prebucketed(self, merged: DataFrame) -> None:
        """Rewrite only the buckets present in `merged` (per-write
        dynamic partition overwrite — session conf untouched).  Expects
        a _finalize()d frame: `_bucket` present, layout materialized."""
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_bucket")
            .parquet(self._data())
        )

    # -- exactly-once ledger + undo log -------------------------------------
    #
    # Ledger keys are "<namespace>-<batch_id>": Structured Streaming
    # batch ids restart at 0 for every new checkpoint, so a bare id
    # would make a reprocessing run (fresh checkpoint, same table)
    # silently skip batches that collide with history.  Pipelines pass
    # a namespace derived from the checkpoint location.

    @staticmethod
    def _ledger_key(batch_id: int, namespace: str) -> str:
        return f"{namespace}-{batch_id}" if namespace else str(batch_id)

    def already_applied(self, batch_id: int, namespace: str = "") -> bool:
        return self.txn_log.is_applied(self._ledger_key(batch_id, namespace))

    def mark_applied(self, batch_id: int, namespace: str = "") -> None:
        self.txn_log.mark_applied(self._ledger_key(batch_id, namespace))

    def _rollback_pending(self) -> None:
        self.txn_log.rollback_incomplete(self._data())

    def apply_batch(
        self,
        batch_id: int,
        new_rows: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
        namespace: str = "",
        writer_id: str = "driver",
        claim_timeout: float = 60.0,
    ) -> None:
        """Idempotent upsert keyed by (namespace, micro-batch id) — the
        foreachBatch contract for exactly-once delivery to this table.
        Crash-safe: affected buckets are snapshotted to an undo log
        before the write; a replay after a crash first rolls back the
        half-applied attempt, so the merge never double-counts.
        Multi-writer-safe: an atomic per-batch claim makes replay-racing
        writers apply each batch exactly once, and a table-level commit
        lock serializes the read-merge-write critical section across
        writers of different batches (see LocalFSTxnLog's multi-writer
        protocol notes)."""
        if self.already_applied(batch_id, namespace):
            return
        key = self._ledger_key(batch_id, namespace)

        # batch claim: exactly one writer owns this batch id.  A loser
        # waits for the winner's outcome — ledger marker (done: return)
        # or claim release without a marker (winner failed: retry the
        # claim and apply ourselves).
        deadline = time.monotonic() + claim_timeout
        while not self.txn_log.try_claim(key, writer_id):
            if self.txn_log.is_applied(key):
                return
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"batch {key} claim held past {claim_timeout}s by "
                    "another writer; if it is dead, run "
                    "txn_log.reclaim_stale()"
                )
            time.sleep(0.02)
        try:
            if self.txn_log.is_applied(key):
                return  # claimed a batch a prior owner already landed
            with self.txn_log.table_lock(writer_id, timeout=claim_timeout):
                self._apply_batch_locked(key, new_rows, merge_fn)
        finally:
            self.txn_log.release_claim(key)

    def _apply_batch_locked(
        self,
        key: str,
        new_rows: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None,
    ) -> None:
        # rollback of crashed attempts must itself run inside the
        # commit lock: restoring bucket snapshots while another writer
        # overwrites those buckets would corrupt the table
        self._rollback_pending()

        if self.exists():
            new_rows = new_rows.cache()
            # the batch's bucket list is collected ONCE and reused for
            # the pruned current-read and the merge_fn safety check —
            # each collect is a Spark job, the dominant fixed cost of a
            # small micro-batch
            new_buckets = self._affected_buckets(new_rows)
            # compute the merged output FIRST: the undo log must cover
            # every bucket the write touches, and a merge_fn may emit
            # keys hashing to buckets beyond the batch's own (checked
            # and refused below, but the snapshot is derived from the
            # merged output so the two can never disagree)
            merged = self._finalize(
                self._merge_existing(new_rows, merge_fn, new_buckets)
            )
            # one buckets collect serves both the safety check and the
            # snapshot loop (one less job per micro-batch); reads the
            # materialized _bucket column, no hash recompute
            merged_buckets = self._affected_buckets(merged)
            if merge_fn is not None:
                extra = set(merged_buckets) - set(new_buckets)
                if extra:
                    raise ValueError(
                        "merge_fn emitted keys hashing to buckets "
                        f"{sorted(extra)} outside the batch's buckets; "
                        "those buckets were not read, so writing would "
                        "drop their existing rows. merge_fn must only "
                        "return keys drawn from the batch or the current "
                        "subset it was given."
                    )
            self.txn_log.begin(key)
            self.txn_log.snapshot_buckets(key, self._data(), merged_buckets)
            self._write_prebucketed(merged)
            self.txn_log.commit(key)
            new_rows.unpersist()
        else:
            # first batch creates the table: undo log records that fact
            # so a crash before the marker drops the half-created table
            self.txn_log.begin(key)
            self.txn_log.record_fresh_table(key)
            self.upsert(new_rows, merge_fn)
            self.txn_log.commit(key)
