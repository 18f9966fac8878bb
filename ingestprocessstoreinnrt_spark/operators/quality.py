"""Data-quality operators: categorical column profiling and
referential-integrity auditing — the checks a pipeline runs before
trusting a 100 TB delivery.

  * column_profile — per categorical column: cardinality, top-value
    share, Shannon entropy.  Entropy is a parallel double sum and
    would be accumulation-order-dependent; each per-group term
    p*ln(p) is computed in one fixed expression order (bit-identical
    cross-engine) and QUANTIZED to an exact integer before the sum —
    the dsum trick applied to an information-theoretic statistic.
  * referential_audit — orphan counts for every foreign-key edge of
    the star schema via anti-join (NOT EXISTS in the oracle): the
    join-shaped data-quality primitive.  One anti-join per edge; at
    100 TB each is a shuffle join on the key, bucketing co-locates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

_ESCALE = 1_000_000_000.0  # entropy terms quantized to 1e-9

PROFILE_COLS = (
    ("events", "event_type"),
    ("documents", "lang"),
    ("documents", "source"),
    ("customer", "c_mktsegment"),
    ("orders", "o_orderpriority"),
)


def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for table, col in PROFILE_COLS:
        counts = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(col).alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        p = F.col("c").cast("double") / F.col("n").cast("double")
        term_q = F.floor(p * F.log(p) * F.lit(_ESCALE) + F.lit(0.5)).cast(
            "long"
        )
        n1 = counts.agg(
            F.sum("c").alias("n"), F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("maxc"),
        )
        parts.append(
            counts.join(F.broadcast(n1))
            .agg(
                F.first(F.lit(f"{table}.{col}")).alias("column_name"),
                F.first("n").alias("n_rows"),
                F.first("n_distinct").alias("n_distinct"),
                (
                    F.first("maxc").cast("double")
                    / F.first("n").cast("double")
                ).alias("top_share"),
                (-F.sum(term_q).cast("double") / F.lit(_ESCALE)).alias(
                    "entropy_nats"
                ),
            )
        )
    return reduce(DataFrame.unionByName, parts)


def _profile_sql() -> str:
    parts = []
    for table, col in PROFILE_COLS:
        term = (
            f"(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE)"
            f" * {_ESCALE}"
        )
        parts.append(
            f"""SELECT '{table}.{col}' AS column_name,
  ANY_VALUE(n) AS n_rows,
  ANY_VALUE(n_distinct) AS n_distinct,
  ANY_VALUE(maxc)::DOUBLE / ANY_VALUE(n)::DOUBLE AS top_share,
  -CAST(SUM(CAST(FLOOR({term} + 0.5) AS BIGINT)) AS DOUBLE) / {_ESCALE}
    AS entropy_nats
FROM (
  SELECT c, SUM(c) OVER () AS n, COUNT(*) OVER () AS n_distinct,
         MAX(c) OVER () AS maxc
  FROM (SELECT {col} AS v, COUNT(*) AS c FROM {table} GROUP BY {col})
)"""
        )
    return "\nUNION ALL\n".join(parts)


FK_EDGES = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One LAZY plan: per FK edge, total child rows from a plain
    aggregate plus orphan rows from a left_anti join aggregate, joined
    on the edge label and unioned.  Nothing executes at build time
    (every other registered query is lazy too), and each edge's
    anti-join still distributes — bucketing co-locates it at scale."""
    parts = []
    for child, fk, parent, pk in FK_EDGES:
        edge = f"{child}.{fk} -> {parent}.{pk}"
        c = load_table(spark, sf_dir, child)
        p = load_table(spark, sf_dir, parent).select(
            F.col(pk).alias("_pk")
        )
        totals = c.agg(
            F.lit(edge).alias("fk_edge"),
            F.count(F.lit(1)).alias("n_child"),
        )
        orphans = c.join(p, c[fk] == p["_pk"], "left_anti").agg(
            F.lit(edge).alias("fk_edge"),
            F.count(F.lit(1)).alias("n_orphans"),
        )
        parts.append(totals.join(orphans, "fk_edge"))
    return reduce(DataFrame.unionByName, parts).select(
        "fk_edge", "n_child", "n_orphans"
    )


def _audit_sql() -> str:
    parts = []
    for child, fk, parent, pk in FK_EDGES:
        parts.append(
            f"""SELECT '{child}.{fk} -> {parent}.{pk}' AS fk_edge,
  (SELECT COUNT(*) FROM {child})::BIGINT AS n_child,
  (SELECT COUNT(*) FROM {child} c
    WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                      WHERE p.{pk} = c.{fk}))::BIGINT AS n_orphans"""
        )
    return "\nUNION ALL\n".join(parts)


QUERIES = {
    "quality_column_profile": column_profile,
    "quality_referential_audit": referential_audit,
}
ORACLE = {
    "quality_column_profile": _profile_sql(),
    "quality_referential_audit": _audit_sql(),
}
