"""PageRank invariants on smoke data; exact values are the DuckDB
oracle's job (operators/graph.py ORACLE)."""

from __future__ import annotations

from ingestprocessstoreinnrt_spark.operators import graph
from tests.conftest import SF_SMOKE


def test_pagerank_ranks_and_kinds(spark):
    rows = sorted(
        graph.pagerank_shipments(spark, SF_SMOKE).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == graph.PR_TOPK
    base = (
        (graph.PR_D_DEN - graph.PR_D_NUM)
        * graph.PR_SCALE
        // graph.PR_D_DEN
    )
    for a, b in zip(rows, rows[1:]):
        # strict ranking order: score desc, node asc on ties
        assert (a.score_q, -a.node_id) >= (b.score_q, -b.node_id)
    for r in rows:
        assert r.score_q >= base  # damping floor
        assert r.node_kind == (
            "supplier" if r.node_id % 2 == 0 else "customer"
        )


def test_pagerank_customers_absorb_rank(spark):
    """Every edge points supplier -> customer, so after 1+ iterations
    customers (rank sinks with in-edges) dominate the top of the
    ranking on this bipartite graph."""
    rows = graph.pagerank_shipments(spark, SF_SMOKE).collect()
    top5 = sorted(rows, key=lambda r: r.rank)[:5]
    assert all(r.node_kind == "customer" for r in top5)
