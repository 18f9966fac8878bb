"""Property tests for the round-7 closing batch — bounds and
invariants the DuckDB hash gate can't state."""

from __future__ import annotations

import math

from tests.conftest import SF_SMOKE


def test_abc_classes_partition_and_cover(spark):
    """A/B/C partition the catalog; A's share >= 0.80 is impossible to
    guarantee pointwise (boundary part may overshoot) but A+B >= 0.95
    and shares sum to 1 exactly."""
    from ingestprocessstoreinnrt_spark.operators import bi

    rows = {r.abc_class: r for r in bi.abc_parts(spark, SF_SMOKE).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r.revenue_cents for r in rows.values())
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-5
    # class A = parts whose CUMULATIVE revenue stays <= 80% (the part
    # crossing the boundary lands in B), so share_A <= 0.80 and A+B
    # <= 0.95, both strict by at most one part's revenue
    assert rows["A"].revenue_cents * 100 <= total * 80
    assert (rows["A"].revenue_cents + rows["B"].revenue_cents) * 100 <= total * 95
    max_part = max(r.revenue_cents for r in rows.values())
    assert (rows["A"].revenue_cents + max_part) * 100 >= total * 80


def test_js_divergence_bounds(spark):
    """JS in [0, ln2]; coverage in (0, 1]."""
    from ingestprocessstoreinnrt_spark.operators import textops

    for r in textops.js_divergence(spark, SF_SMOKE).collect():
        assert 0.0 <= r.js_divergence <= math.log(2) + 1e-9, r
        assert 0.0 < r.coverage <= 1.0, r


def test_rich_club_counts_consistent(spark):
    """phi in [0, 1]; node/edge counts weakly decrease with k."""
    from ingestprocessstoreinnrt_spark.operators import basket

    rows = basket.rich_club(spark, SF_SMOKE).collect()
    last_n, last_e = None, None
    for r in rows:
        if r.phi is not None:
            assert 0.0 <= r.phi <= 1.0, r
        if last_n is not None:
            assert r.n_nodes <= last_n and r.n_edges <= last_e, rows
        last_n, last_e = r.n_nodes, r.n_edges


def test_ivm_join_delta_equals_direct_join(spark):
    """The four-term merge equals the direct join-aggregate computed
    in Spark itself (independent of the DuckDB oracle)."""
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import incremental

    got = {
        r.n_name: (r.n_orders, r.revenue_cents)
        for r in incremental.ivm_join_delta(spark, SF_SMOKE).collect()
    }
    orders = load_table(spark, SF_SMOKE, "orders")
    cust = load_table(spark, SF_SMOKE, "customer")
    nat = load_table(spark, SF_SMOKE, "nation")
    direct = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
            ).cast("long").alias("cents"),
        )
        .collect()
    )
    assert got == {r.n_name: (r.n, r.cents) for r in direct}


def test_mcnemar_cells_partition(spark):
    """The four McNemar cells partition the corpus exactly."""
    from ingestprocessstoreinnrt_spark.operators import ml

    r = ml.mcnemar_gates(spark, SF_SMOKE).collect()[0]
    assert (
        r.both_right + r.both_wrong + r.only_logistic + r.only_rule == r.n
    ), r
