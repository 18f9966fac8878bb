"""Decision-support battery (operators/dss.py): result invariants the
oracle can't express (cross-row conservation laws) plus plan-shape
regressions (broadcast dims, top-k, no cartesian)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ingestprocessstoreinnrt_spark.operators import dss
from ingestprocessstoreinnrt_spark.catalog import load_table
from ingestprocessstoreinnrt_spark.plans import explain as E
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_order_count_dist_conserves_customers(spark):
    """The histogram partitions the customer universe: custdist sums to
    |customer| and c_count * custdist sums to |orders|."""
    rows = dss.order_count_dist(spark, SF_SMOKE).collect()
    n_cust = load_table(spark, SF_SMOKE, "customer").count()
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r.custdist for r in rows) == n_cust
    assert sum(r.c_count * r.custdist for r in rows) == n_orders


def test_promo_share_bounded_and_conserves_items(spark):
    rows = dss.promo_share(spark, SF_SMOKE).collect()
    n_li = load_table(spark, SF_SMOKE, "lineitem").count()
    assert sum(r.n_items for r in rows) == n_li
    for r in rows:
        assert 0.0 <= r.promo_share <= 1.0
        assert r.promo_revenue <= r.total_revenue + 1e-9


def test_small_qty_rows_truly_below_threshold(spark):
    """Brute-force recheck: every counted lineitem sits under 20% of its
    part's average quantity (threshold computed independently here)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    avg = {
        r.l_partkey: r.a
        for r in li.groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("a"))
        .collect()
    }
    expected = (
        li.select("l_partkey", "l_quantity")
        .collect()
    )
    # quantized davg differs from plain avg by <=5e-5; use a tolerant band
    n_expected = sum(
        1 for r in expected if r.l_quantity < 0.2 * avg[r.l_partkey] - 1e-3
    )
    n_upper = sum(
        1 for r in expected if r.l_quantity < 0.2 * avg[r.l_partkey] + 1e-3
    )
    n_got = sum(
        r.n_small for r in dss.small_qty_revenue(spark, SF_SMOKE).collect()
    )
    assert n_expected <= n_got <= n_upper


def test_large_orders_exceed_threshold_and_rank(spark):
    rows = dss.large_orders(spark, SF_SMOKE).collect()
    assert rows, "threshold should select some orders even at sf0.001"
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)
    for r in rows:
        assert r.total_qty > dss.LARGE_ORDER_QTY


def test_sole_late_supplier_brute_force(spark):
    """Recompute Q21 semantics row-by-row on the smoke SF and compare
    the per-supplier wait counts exactly."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    odate = {r.o_orderkey: r.o_orderdate for r in orders.collect()}
    from collections import defaultdict
    from datetime import timedelta

    supps, lates = defaultdict(set), defaultdict(set)
    for r in li.collect():
        supps[r.l_orderkey].add(r.l_suppkey)
        if r.l_shipdate > odate[r.l_orderkey] + timedelta(
            days=dss.LATE_AFTER_DAYS
        ):
            lates[r.l_orderkey].add(r.l_suppkey)
    waits = defaultdict(int)
    for ok, ss in supps.items():
        if len(ss) >= 2 and len(lates[ok]) == 1:
            waits[next(iter(lates[ok]))] += 1
    name = {
        r.s_suppkey: r.s_name
        for r in load_table(spark, SF_SMOKE, "supplier").collect()
    }
    expected = sorted(
        ((name[k], v) for k, v in waits.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    got = [
        (r.s_name, r.numwait)
        for r in dss.sole_late_supplier(spark, SF_SMOKE).collect()
    ]
    assert got == expected


def test_nation_profit_plan_broadcasts_dims_once_shuffle_joined(spark):
    """The 5-table star must plan part/supplier/nation as broadcasts;
    only the lineitem-orders join may shuffle, and nothing may plan as
    a nested-loop/cartesian."""
    df = dss.nation_profit(spark, SF_ORACLE)
    plan = E.formatted_plan(df)
    assert E.uses_broadcast_join(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # name-filter reaches the part scan (partition-prunable at scale)
    assert E.has_pushed_filter(df, "p_name")


def test_small_qty_threshold_join_broadcasts(spark):
    df = dss.small_qty_revenue(spark, SF_ORACLE)
    assert E.uses_broadcast_join(df)


def test_large_orders_top_k_no_global_sort(spark):
    assert E.uses_top_k(dss.large_orders(spark, SF_ORACLE))


def test_sole_late_single_fact_shuffle_no_self_join(spark):
    """One lineitem scan only — the EXISTS/NOT-EXISTS collapse must not
    reintroduce a second scan or a fact-fact self-join."""
    plan = E.formatted_plan(dss.sole_late_supplier(spark, SF_ORACLE))
    assert plan.count("lineitem.parquet") <= 1 or (
        plan.count("Scan parquet") <= 3
    )
    assert "CartesianProduct" not in plan


def test_cohort_ltv_triangle_conserves_orders(spark):
    rows = dss.cohort_ltv(spark, SF_SMOKE).collect()
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert sum(r.n_orders for r in rows) == n_orders
    # age 0 exists for every cohort (the acquisition month itself)
    cohorts = {r.cohort_month for r in rows}
    age0 = {r.cohort_month for r in rows if r.age_months == 0}
    assert cohorts == age0
    for r in rows:
        assert r.age_months >= 0


def test_priority_check_plans_left_semi(spark):
    """Q4's EXISTS must plan as LeftSemi with the quarter filter pushed
    into the orders scan — never join+distinct."""
    df = dss.order_priority_check(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert E.has_pushed_filter(df, "o_orderdate")
    # priority counts bound by quarter's orders
    total = sum(r.order_count for r in df.collect())
    quarter = (
        load_table(spark, SF_ORACLE, "orders")
        .filter(
            (F.col("o_orderdate") >= dss.PRIO_START)
            & (F.col("o_orderdate") < dss.PRIO_END)
        )
        .count()
    )
    assert 0 < total <= quarter


def test_dormant_prospects_plans_left_anti(spark):
    """Q22's NOT EXISTS must plan as LeftAnti with the recency filter
    pushed into the orders scan."""
    df = dss.dormant_prospects(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert E.has_pushed_filter(df, "o_orderdate")
    rows = df.collect()
    assert rows and all(
        r.segment in dss.PROSPECT_SEGMENTS for r in rows
    )


def test_disjunctive_revenue_pushes_quantity_range(spark):
    """Q19's OR-of-ANDs: the common l_quantity in [1,30] envelope must
    reach the lineitem scan as pushed min/max filters."""
    df = dss.disjunctive_revenue(spark, SF_ORACLE)
    assert E.has_pushed_filter(df, "l_quantity")
    assert E.uses_broadcast_join(df)


def test_nation_volume_directions_partition_revenue(spark):
    """Both trade directions appear and every row names the two
    configured nations on opposite sides."""
    rows = dss.nation_volume(spark, SF_ORACLE).collect()
    assert rows
    dirs = {(r.supp_nation, r.cust_nation) for r in rows}
    a, b = dss.TRADE_NATIONS
    assert dirs <= {(a, b), (b, a)} and len(dirs) == 2
    assert all(r.volume > 0 and r.n_items > 0 for r in rows)


def test_shipdelay_buckets_tile_lineitems(spark):
    """fast/medium/slow counts sum to the joined lineitem total."""
    rows = dss.shipdelay_priority(spark, SF_ORACLE).collect()
    got = sum(r.critical_count + r.normal_count for r in rows)
    assert got == load_table(spark, SF_ORACLE, "lineitem").count()
