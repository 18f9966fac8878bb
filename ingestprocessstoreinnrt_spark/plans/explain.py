"""Physical-plan introspection helpers — the audit tooling behind the
plan-regression tests (tests/test_plans.py).

The reference hand-implements its "optimizations" (manual projection
strings, hand-fused closures — SURVEY §4); here they must come from
Catalyst, and these helpers assert they actually did: a filter that
doesn't reach PushedFilters, a pruned column that still appears in
ReadSchema, or a small dim joined without broadcast is a performance
regression even when results stay correct.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan's PushedFilters contains the fragment
    (e.g. 'EqualTo(o_custkey,42)')."""
    plan = formatted_plan(df)
    return any(
        fragment in line
        for line in plan.splitlines()
        if "PushedFilters" in line
    )


def scan_reads_column(df: DataFrame, column: str) -> bool:
    """True if any scan's ReadSchema still materializes the column."""
    plan = formatted_plan(df)
    return any(
        column in line for line in plan.splitlines() if "ReadSchema" in line
    )


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def uses_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def uses_top_k(df: DataFrame) -> bool:
    """orderBy().limit() planned as TakeOrderedAndProject (per-partition
    top-k + driver merge), not a global sort."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_shuffle_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange node.
    CAVEAT: under AQE the pre-execution formatted plan hides exchange
    nodes (`AdaptiveSparkPlan ... isFinalPlan=false`) — disable
    spark.sql.adaptive.enabled around the plan capture or this check is
    vacuously False."""
    plan = formatted_plan(df)
    return any(
        line.strip().startswith(("Exchange", "+- Exchange", ":- Exchange"))
        or "+- Exchange" in line
        or ":- Exchange" in line
        for line in plan.splitlines()
    )


def partial_aggregation_count(df: DataFrame) -> int:
    """HashAggregate appears in partial+final pairs when map-side
    combine is active."""
    return formatted_plan(df).count("HashAggregate")
