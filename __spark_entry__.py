"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Query implementations live in ``ingestprocessstoreinnrt_spark``; this
module only aggregates the registries.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ingestprocessstoreinnrt_spark.operators import (
    asof,
    bi,
    cdc,
    graph,
    layout,
    sketch,
    timeseries,
    dedup,
    entity,
    funnel,
    ml,
    multimodal,
    profile,
    quality,
    similarity,
    skew,
    textops,
    windows,
)

# smoke entry targets sf0.001 per the driver contract; overridable for
# consistency with catalog.TESTDATA_ROOT's env-driven default
_SMOKE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001"
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return bi.pricing_rollup(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (bi, entity, profile, dedup, similarity, textops,
                multimodal, ml, windows, skew, asof, sketch, cdc, graph,
                timeseries, layout, quality, funnel):
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (bit-exact by construction; see
    ingestprocessstoreinnrt_spark.functions.scalars)."""
    out: dict[str, str] = {}
    for mod in (bi, entity, profile, dedup, similarity, textops,
                multimodal, ml, windows, skew, asof, sketch, cdc, graph,
                timeseries, layout, quality, funnel):
        out.update(mod.ORACLE)
    return out
