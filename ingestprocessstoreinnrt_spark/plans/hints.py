"""Join-strategy hints with a scale guard.

A forced ``F.broadcast(df)`` bypasses Spark's size check
(``spark.sql.autoBroadcastJoinThreshold``): the hint wins regardless of
how big the frame turns out to be, and a dim that is 2 MB at bench
scale can be multi-GB at 100 TB — the driver collects it and dies.

Policy (applied repo-wide, enforced by tests/test_plans.py):

* **Scale-invariant frames** — cardinality fixed no matter the data
  volume (``nation`` = 25 rows, ``region`` = 5, single-row stat frames,
  quantile grids, centroid tables, k-row probe panels) — MAY be forced:
  ``maybe_broadcast(df, scale_invariant=True)``.
* **SF-scaling frames** — anything whose row count grows with the fact
  data (``part``, ``supplier``, ``customer``, any aggregate keyed by a
  fact-table key) — are NEVER forced.  ``maybe_broadcast(df)`` returns
  the frame unhinted and the engine picks the strategy from *measured*
  sizes: the static planner broadcasts when the scan's sizeInBytes
  estimate is under the threshold, and AQE re-plans shuffle joins into
  broadcast joins at runtime from actual shuffle statistics.  At bench
  scale the physical plan is the same BroadcastHashJoin the hint would
  have produced (asserted by tests/test_plans.py); at 100 TB the same
  code degrades to a sort-merge join instead of an OOM.

``est_rows`` exists for call sites that know a bound from construction
(e.g. a ``LIMIT k`` or an aggregate over a bounded key domain): a known
bound under ``BROADCAST_ROW_CAP`` is treated as scale-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A slim dim row (a key + a short payload) is tens of bytes; 2M rows
# keeps the materialized broadcast comfortably under the ~1 GB driver
# collect guard even with row-object overhead.
BROADCAST_ROW_CAP = 2_000_000


def maybe_broadcast(
    df: DataFrame,
    *,
    scale_invariant: bool = False,
    est_rows: int | None = None,
) -> DataFrame:
    """Force a broadcast hint only when the frame is provably small.

    ``scale_invariant=True`` asserts the frame's cardinality does not
    grow with the data volume; ``est_rows`` asserts a construction-time
    row bound.  Anything else is returned unhinted so the engine
    chooses from measured sizes (static estimate or AQE runtime stats).
    """
    if scale_invariant:
        return F.broadcast(df)
    if est_rows is not None and est_rows <= BROADCAST_ROW_CAP:
        return F.broadcast(df)
    return df
