"""Mutable keyed table on plain parquet — the serving-layer role Kudu
plays in the reference (upsert by primary key, hash-partitioned:
`DISTRIBUTE BY HASH (vender_id) INTO 3 BUCKETS`,
create_ny_taxi_yellow_trip_table.impala:22; insert-vs-update chosen per
row, NyTaxiYellowTripStreaming.scala:223-229).

Design for 100 TB:
  * rows live under hash-bucket partitions (`_bucket=NN/`); an upsert
    rewrites ONLY the buckets its keys touch (dynamic partition
    overwrite), so cost scales with the update's key spread, not table
    size.  Bucket count is the knob — same role as Kudu's hash buckets.
  * point lookups filter on the derivable `_bucket` value, so Catalyst
    partition-prunes to one directory.
  * exactly-once under micro-batch replay: a batch-id ledger makes
    `apply_batch` idempotent — re-delivered batches are skipped
    (replaces the reference's swallow-duplicate-key-errors approach,
    NyTaxiYellowTripStreaming.scala:298-313).

The reference's per-row insert-vs-update flag dance collapses into
last-write-wins MERGE by key; a `merge_fn` hook supports aggregate
merging (running entities) instead of row replacement.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


class UpsertTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        num_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key_cols = list(key_cols)
        self.num_buckets = num_buckets
        self._ledger = os.path.join(path, "_applied_batches")

    # -- storage ------------------------------------------------------------

    def _bucket_col(self) -> F.Column:
        return F.pmod(
            F.xxhash64(*self.key_cols), F.lit(self.num_buckets)
        ).cast("int")

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "data"))

    def read(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "data")).drop(
            "_bucket"
        )

    def read_bucket_pruned(self, keys_df: DataFrame) -> DataFrame:
        """Read only the bucket partitions containing the given keys."""
        buckets = [
            r[0]
            for r in keys_df.select(self._bucket_col().alias("b"))
            .distinct()
            .collect()
        ]
        df = self.spark.read.parquet(os.path.join(self.path, "data"))
        return df.filter(F.col("_bucket").isin(buckets)).drop("_bucket")

    def init(self, df: DataFrame) -> None:
        """Create/replace the table from a snapshot (bootstrap, J1)."""
        (
            df.withColumn("_bucket", self._bucket_col())
            .repartition("_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(os.path.join(self.path, "data"))
        )

    # -- upsert -------------------------------------------------------------

    def upsert(
        self,
        new_rows: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    ) -> None:
        """MERGE by key.  Default: last-write-wins row replacement.  With
        merge_fn(current_subset, new_rows) -> merged: aggregate merging.
        Only the buckets present in `new_rows` are rewritten."""
        if not self.exists():
            merged = merge_fn(None, new_rows) if merge_fn else new_rows
            self.init(merged)
            return

        new_rows = new_rows.cache()
        current = self.read_bucket_pruned(new_rows)
        if merge_fn is not None:
            merged = merge_fn(current, new_rows)
        else:
            # new rows win over current on key collision
            w = Window.partitionBy(*self.key_cols).orderBy(F.col("_pri").desc())
            merged = (
                current.withColumn("_pri", F.lit(0))
                .unionByName(new_rows.withColumn("_pri", F.lit(1)))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_pri", "_rn")
            )
        self.spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        # materialize before the write: `merged` reads the same parquet
        # partitions the write replaces (read-overwrite hazard otherwise)
        merged = merged.localCheckpoint(eager=True)
        (
            merged.withColumn("_bucket", self._bucket_col())
            .repartition("_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(os.path.join(self.path, "data"))
        )
        new_rows.unpersist()

    # -- exactly-once ledger ------------------------------------------------

    def already_applied(self, batch_id: int) -> bool:
        return os.path.exists(os.path.join(self._ledger, str(batch_id)))

    def mark_applied(self, batch_id: int) -> None:
        os.makedirs(self._ledger, exist_ok=True)
        with open(os.path.join(self._ledger, str(batch_id)), "w") as f:
            f.write("")

    def apply_batch(
        self,
        batch_id: int,
        new_rows: DataFrame,
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame] | None = None,
    ) -> None:
        """Idempotent upsert keyed by micro-batch id — the foreachBatch
        contract for exactly-once delivery to this table."""
        if self.already_applied(batch_id):
            return
        self.upsert(new_rows, merge_fn)
        self.mark_applied(batch_id)
