"""User-facing engine surface: ad-hoc SQL over the registered tables
(the Impala BI role, SURVEY 3.2) plus the managed-table DDL/DML surface
(K6): CREATE TABLE (keyed, hash-bucketed like the Kudu DDL), INSERT,
UPSERT, UPDATE, DROP.

A managed table is an UpsertTable (streaming/upsert.py) — the same
storage the NRT pipelines maintain, so "the stream keeps the table
fresh, analysts query it with SQL" works against one artifact
(impala/ny_taxi/*.impala: create/insert/update/drop shapes).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import register_views
from .streaming.upsert import UpsertTable


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str, warehouse: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.warehouse = warehouse
        self.tables: dict[str, UpsertTable] = {}
        register_views(spark, sf_dir)

    # -- SQL (Impala-role entry point) --------------------------------------

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- DDL ---------------------------------------------------------------

    def create_table(
        self, name: str, key_cols: list[str], num_buckets: int = 16
    ) -> UpsertTable:
        """CREATE TABLE ... PRIMARY KEY (...) DISTRIBUTE BY HASH INTO n
        BUCKETS (create_ny_taxi_yellow_trip_table.impala:22 analog)."""
        if name in self.tables:
            raise ValueError(f"table {name!r} exists")
        t = UpsertTable(
            self.spark,
            os.path.join(self.warehouse, name),
            key_cols,
            num_buckets,
        )
        self.tables[name] = t
        return t

    def drop_table(self, name: str) -> None:
        t = self.tables.pop(name)
        shutil.rmtree(t.path, ignore_errors=True)
        self.spark.catalog.dropTempView(name) if self.spark.catalog.tableExists(
            name
        ) else None

    def table(self, name: str) -> DataFrame:
        df = self.tables[name].read()
        df.createOrReplaceTempView(name)
        return df

    # -- DML ---------------------------------------------------------------

    def insert_values(self, name: str, rows: list[tuple], columns: list[str]):
        """INSERT INTO ... VALUES (insert_ny_taxi_yellow_entity.impala:1-26
        analog) — upsert semantics on the primary key."""
        df = self.spark.createDataFrame(rows, columns)
        self.tables[name].upsert(df)

    def upsert(self, name: str, df: DataFrame) -> None:
        self.tables[name].upsert(df)

    def update(self, name: str, where: str, assignments: dict[str, str]):
        """UPDATE t SET c = expr WHERE pred
        (update_ny_taxi_yellow_entity.impala:1 analog): read-modify-write
        of only the affected rows, merged back by key.

        SQL semantics: all RHS expressions see the PRE-update row (one
        simultaneous select, not sequential withColumn — so
        {a: 'b', b: 'a'} swaps).  Key columns cannot be assigned: the
        upsert merges by key, so a key rewrite would leave the old row
        behind (Kudu disallows PK updates for the same reason).
        """
        t = self.tables[name]
        bad = set(assignments) & set(t.key_cols)
        if bad:
            raise ValueError(
                f"cannot UPDATE primary key column(s) {sorted(bad)}; "
                "delete + insert instead (Kudu semantics)"
            )
        current = t.read()
        unknown = set(assignments) - set(current.columns)
        if unknown:
            # SQL UPDATE errors on unknown columns; silently dropping a
            # misspelled assignment while still rewriting rows would be
            # a no-op that looks like success
            raise ValueError(
                f"unknown column(s) in UPDATE assignments: {sorted(unknown)}"
            )
        affected = current.filter(where).select(
            *[
                F.expr(assignments[c]).alias(c) if c in assignments else F.col(c)
                for c in current.columns
            ]
        )
        t.upsert(affected)
