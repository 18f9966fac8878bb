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


def _bracket_groups(line: str) -> list[str]:
    """Top-level `[...]` group contents of an Arguments line, parsed
    with a balanced depth scan — a nested bracket inside the
    window-expressions group (array literal, future type formats)
    cannot shift the partition/order groups the way a flat regex
    findall would (ADVICE r8)."""
    groups: list[str] = []
    depth, start = 0, -1
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(line[start:i])
            elif depth < 0:
                raise ValueError(f"unbalanced brackets in plan line: {line}")
    if depth != 0:
        raise ValueError(f"unbalanced brackets in plan line: {line}")
    return groups


def window_partition_specs(df: DataFrame) -> list[list[str]]:
    """Base column names of each Window node's PARTITION BY spec, one
    list per Window node in the physical plan (empty list = global
    window).  Parsed from the formatted plan's Arguments line, whose
    tail is `], [<partition cols>], [<order cols>]`; `#id` suffixes are
    stripped so callers compare plain names.  The scale audit in
    tests/test_plans.py uses this to forbid corpus-grain windows whose
    spec is empty or constant-cardinality (VERDICT r7 finding #1)."""
    import re

    plan = formatted_plan(df).split("== Physical Plan ==")[-1]
    lines = plan.splitlines()
    specs: list[list[str]] = []
    for i, line in enumerate(lines):
        # exactly the Window node — NOT WindowGroupLimit (the map-side
        # rank-limit pushdown, whose Arguments line has a different
        # shape and no windowspecdefinition)
        if not re.fullmatch(r"\(\d+\) Window", line.strip()):
            continue
        for j in range(i + 1, min(i + 8, len(lines))):
            if not lines[j].startswith("Arguments:"):
                continue
            # bracket groups: [window exprs] then, when non-empty,
            # [partition cols] and/or [order cols] — the formatter
            # OMITS empty lists, so a lone trailing group whose items
            # carry ASC/DESC direction markers is the order list of a
            # global (empty-spec) window.  Balanced scan, and fail
            # loudly on an unexpected shape: a silently-misread spec
            # would hollow out the corpus-grain window guard.
            groups = _bracket_groups(lines[j])
            if not 1 <= len(groups) <= 3:
                raise ValueError(
                    f"unexpected Window Arguments shape ({len(groups)} "
                    f"bracket groups): {lines[j]}"
                )
            rest = groups[1:]
            if len(rest) >= 2:
                spec = rest[-2]
            elif len(rest) == 1 and not (
                " ASC" in rest[0] or " DESC" in rest[0]
            ):
                spec = rest[0]
            else:
                spec = ""
            specs.append(
                [
                    re.sub(r"#\d+\w*", "", c.strip())
                    for c in spec.split(",")
                    if c.strip()
                ]
            )
            break
    return specs


def partial_aggregation_count(df: DataFrame) -> int:
    """HashAggregate appears in partial+final pairs when map-side
    combine is active."""
    return formatted_plan(df).count("HashAggregate")
