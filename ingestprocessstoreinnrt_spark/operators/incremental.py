"""Incremental aggregate maintenance (materialized-view delta merge).

The reference maintains serving aggregates by re-upserting whole rows
per micro-batch (NyTaxiYellowTripStreaming.scala:223-229); the batch
generalization a 100 TB pipeline needs is incremental view
maintenance: keep per-key PARTIAL aggregates (count, quantized sum),
merge a delta batch's partials into the base with one key-equi union
aggregate, and never rescan history.

The driver-gate query makes the correctness statement itself the
oracle: Spark computes base-partials(90% of orders) merged with
delta-partials(10%) — the DuckDB twin aggregates the whole table
directly.  A hash match PROVES merged-incremental == full-recompute,
which is the IVM invariant (sums/counts form a commutative monoid;
avg is derived at read time, the same sufficient-statistics discipline
as streaming/state.py and operators/entity.py).

Scale shape: base and delta partials are both keyed aggregates
(map-side combined); the merge is one shuffle on the key, and with the
base stored bucketed by key (UpsertTable's layout) it co-locates — the
delta's size, not the base's, drives the cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.scalars import quantize, sql_davg

_DELTA_MOD = 10  # orders with o_orderkey % 10 == 9 play the delta batch


def _partials(orders: DataFrame) -> DataFrame:
    """Per-customer mergeable sufficient statistics."""
    return orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(quantize(F.col("o_totalprice"))).alias("qsum"),
    )


def incremental_customer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(o_custkey, n_orders, avg_totalprice) maintained incrementally:
    base partials + delta partials merged by key, average derived at
    read time from the merged statistics."""
    orders = load_table(spark, sf_dir, "orders")
    base = _partials(orders.filter(F.col("o_orderkey") % _DELTA_MOD != 9))
    delta = _partials(orders.filter(F.col("o_orderkey") % _DELTA_MOD == 9))
    merged = (
        base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("qsum").alias("qsum"),
        )
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        (
            F.col("qsum").cast("double")
            / F.lit(10000.0)
            / F.col("n_orders").cast("double")
        ).alias("avg_totalprice"),
    )


# The oracle aggregates the FULL table in one pass: matching it proves
# the two-partial merge loses nothing.
_INCR_SQL = f"""
SELECT o_custkey, COUNT(*)::BIGINT AS n_orders,
  {sql_davg("o_totalprice", "avg_totalprice")}
FROM orders GROUP BY o_custkey
"""

QUERIES = {"incremental_customer_agg": incremental_customer_agg}
ORACLE = {"incremental_customer_agg": _INCR_SQL}
