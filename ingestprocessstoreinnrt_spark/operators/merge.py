"""Generic exact merge of keyed aggregate tables — the merge half of the
reference's hand-rolled accumulator pair (NyTaxiYellowEntity.`+`,
ConnectedCarProfile.combineAverages) as declarative re-aggregation.

Columns are declared by kind:
  count cols  — BIGINT, merge = SUM
  qsum cols   — doubles produced by functions.scalars.dsum (value =
                S/10000.0 with S integral); merge requantizes back to S
                (exact for |S| < 2^52), sums integers, divides once —
                bit-identical to a single-pass aggregate however the
                input was split.  This is what makes the streaming
                foreachBatch upsert provably equal to the batch rollup.
  max cols    — merge = MAX (works for numerics and timestamps)
  derive      — optional post-projection recomputing derived columns
                (averages, scores, clamped periods) from merged parts.

Used by: operators.entity (customer entity), operators.taxi (vendor
entity), operators.car (profile sufficient-statistics), streaming
pipelines (M4).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import quantize


def merge_keyed(
    parts: Sequence[DataFrame],
    key_cols: Sequence[str],
    count_cols: Sequence[str] = (),
    qsum_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    derive: Callable[[DataFrame], DataFrame] | None = None,
    drop_before_merge: Sequence[str] = (),
) -> DataFrame:
    assert parts, "need at least one part"
    final_columns = list(parts[0].columns)
    merge_columns = [c for c in final_columns if c not in drop_before_merge]
    unioned = parts[0].select(*merge_columns)
    for p in parts[1:]:
        unioned = unioned.unionByName(p.select(*merge_columns))

    for c in qsum_cols:
        # same primitive that produced the value in dsum(): recovers the
        # integer numerator exactly (|S| < 2^52)
        unioned = unioned.withColumn(c, quantize(F.col(c)))

    aggs = (
        [F.sum(c).cast("long").alias(c) for c in count_cols]
        + [
            (F.sum(c).cast("double") / F.lit(10000.0)).alias(c)
            for c in qsum_cols
        ]
        + [F.max(c).alias(c) for c in max_cols]
    )
    merged = unioned.groupBy(*key_cols).agg(*aggs)
    if derive is not None:
        merged = derive(merged)  # must re-add any drop_before_merge columns
    return merged.select(*final_columns)
