"""BI query layer: every query matches its DuckDB oracle exactly at
sf0.01 (the driver's t2 scale), via the same comparison the driver does
(row count + sorted schema + values), but with exact float equality."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tools.oracle_check import _norm_rows

import __spark_entry__ as entrymod


def _compare(spark, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_ORACLE)
    sc, sr = _norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = duck.execute(oracles[name])
    dc, dr = _norm_rows([d[0] for d in res.description], res.fetchall())
    assert len(sr) > 0, f"{name}: empty result"
    assert sc == dc, f"{name}: schema mismatch {sc} vs {dc}"
    assert sr == dr, f"{name}: values differ"


@pytest.mark.parametrize(
    "name",
    [
        "bi_pricing_rollup",
        "bi_rollup_levels",
        "bi_first_n",
        "bi_percentiles",
        "bi_index_search",
        "bi_topk_customers",
        "bi_time_of_day",
        "bi_point_lookup",
        "bi_enrich_join",
        "bi_dict_enrich",
    ],
)
def test_bi_query_matches_oracle(spark, duck, name):
    _compare(spark, duck, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 10


def test_every_query_has_oracle_or_is_flagged(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)


def test_pareto_share_matches_brute_force(spark):
    """Thresholds are monotone and each n_customers is MINIMAL: the
    top-(n-1) customers by revenue don't reach the threshold, top-n
    do — checked against a driver-side exact replay."""
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.functions.scalars import quantize
    from ingestprocessstoreinnrt_spark.operators import bi
    from tests.conftest import SF_SMOKE

    rows = {
        r.threshold_pct: r
        for r in bi.pareto_share(spark, SF_SMOKE).collect()
    }
    assert sorted(rows) == sorted(bi.PARETO_THRESHOLDS)
    rev = sorted(
        (
            r.rev_q
            for r in load_table(spark, SF_SMOKE, "orders")
            .groupBy("o_custkey")
            .agg(F.sum(quantize(F.col("o_totalprice"))).alias("rev_q"))
            .collect()
        ),
        reverse=True,
    )
    tot = sum(rev)
    prev_n = 0
    for t in sorted(rows):
        r = rows[t]
        assert r.n_customers >= prev_n
        prev_n = r.n_customers
        top = sum(rev[: r.n_customers])
        assert 100 * top >= t * tot
        if r.n_customers > 1:
            assert 100 * sum(rev[: r.n_customers - 1]) < t * tot
        assert abs(r.cum_share - top / tot) < 1e-12
        assert abs(r.pct_customers - r.n_customers / len(rev)) < 1e-12


def test_market_share_bounds_and_total(spark):
    """Share ∈ [0,1], target ≤ total, and the yearly totals sum to the
    unconditional filtered revenue (mass conservation)."""
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.functions.scalars import quantize
    from ingestprocessstoreinnrt_spark.operators import bi
    from tests.conftest import SF_SMOKE

    rows = bi.market_share(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.mkt_share <= 1.0
        assert r.target_rev <= r.total_rev
    li = load_table(spark, SF_SMOKE, "lineitem")
    part = load_table(spark, SF_SMOKE, "part").filter(
        F.col("p_type") == bi.SHARE_PART_TYPE
    )
    nat = load_table(spark, SF_SMOKE, "nation")
    reg = load_table(spark, SF_SMOKE, "region").filter(
        F.col("r_name") == bi.SHARE_MKT_REGION
    )
    cust = (
        load_table(spark, SF_SMOKE, "customer")
        .join(nat, F.col("c_nationkey") == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey")
    )
    orders = load_table(spark, SF_SMOKE, "orders").join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    )
    want = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.sum(
                quantize(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("q")
        )
        .collect()[0]
        .q
    )
    got = round(sum(r.total_rev for r in rows) * 10000.0)
    assert got == want


def test_top_supplier_is_argmax(spark):
    """The reported supplier(s) hold the exact max quarterly revenue."""
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.functions.scalars import quantize
    from ingestprocessstoreinnrt_spark.operators import bi
    from tests.conftest import SF_SMOKE

    per_supp = {
        r.l_suppkey: r.q
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .filter(
            (F.col("l_shipdate") >= bi.TOP_SUPP_START)
            & (F.col("l_shipdate") < bi.TOP_SUPP_END)
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                quantize(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                )
            ).alias("q")
        )
        .collect()
    }
    best = max(per_supp.values())
    want = {k for k, v in per_supp.items() if v == best}
    rows = bi.top_supplier(spark, SF_SMOKE).collect()
    assert {r.s_suppkey for r in rows} == want
    for r in rows:
        assert round(r.total_revenue * 10000.0) == best


def test_status_pivot_mass_conservation(spark):
    """Pivot cells sum back to the unpivoted per-priority totals."""
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import bi
    from tests.conftest import SF_SMOKE

    rows = {
        r.o_orderpriority: r
        for r in bi.status_pivot(spark, SF_SMOKE).collect()
    }
    plain = load_table(spark, SF_SMOKE, "orders").groupBy(
        "o_orderpriority"
    ).agg(F.count(F.lit(1)).alias("n")).collect()
    assert {r.o_orderpriority for r in plain} == set(rows)
    for p in plain:
        r = rows[p.o_orderpriority]
        assert (r.n_f or 0) + (r.n_o or 0) + (r.n_p or 0) == p.n


def test_asof_nearest_matches_bruteforce(spark):
    """Nearest-click choice replayed in Python per purchase."""
    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import asof
    import pyspark.sql.functions as F

    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    ).collect()
    clicks = {}
    for r in ev:
        if r.event_type == asof.RIGHT_TYPE:
            k = (r.user_id, r.ts_us)
            if k not in clicks or r.event_id > clicks[k][0]:
                clicks[k] = (r.event_id, r.value)
    by_user = {}
    for (u, ts), (_, val) in clicks.items():
        by_user.setdefault(u, []).append((ts, val))
    got = {
        r.event_id: r
        for r in asof.asof_nearest(spark, SF_ORACLE).collect()
    }
    purchases = [r for r in ev if r.event_type == asof.LEFT_TYPE]
    assert len(got) == len(purchases)
    for p in purchases:
        cands = by_user.get(p.user_id, [])
        row = got[p.event_id]
        if not cands:
            assert row.nearest_click_ts_us is None
            continue
        best = min(
            cands,
            key=lambda c: (abs(c[0] - p.ts_us), 0 if c[0] <= p.ts_us else 1),
        )
        assert row.nearest_click_ts_us == best[0]
        assert row.gap_us == abs(best[0] - p.ts_us)
        assert row.direction == (
            "backward" if best[0] <= p.ts_us else "forward"
        )
