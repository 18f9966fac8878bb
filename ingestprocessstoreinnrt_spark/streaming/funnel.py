"""Streaming ordered funnel — the stateful twin of
operators.funnel.funnel_counts: per user, track the earliest
qualifying (view, click, purchase) chain ACROSS micro-batches with
applyInPandasWithState.

Batch semantics (funnel.py): t_k = earliest stage-k event strictly
after t_{k-1}.  Incrementally that is a per-user state machine over
events in event-time order: a stage-k event at ts advances the chain
iff t_{k-1} is set and ts > t_{k-1}, and each t_k is written at most
once — under the engine's streaming contract (per-key event-time
ordered arrival across micro-batches, the rolling-features contract,
ROUND_NOTES invariant 8) the first qualifying event IS the minimum,
so states are monotone null -> value and never revised.  That makes
the operator append-safe: emissions per batch are the current chain,
and the final chain per user equals the batch window computation
bit-for-bit (tests/test_streaming.py::
test_streaming_funnel_equals_batch).

Scale shape: state is three longs per user in the state store; only
keys with new data are invoked per batch; the shuffle is the same
user_id partitioning the batch funnel uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.funnel import FUNNEL_STAGES

STATE_SCHEMA = "t0 LONG, t1 LONG, t2 LONG"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t0", T.LongType()),
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        t0, t1, t2 = state.get
    else:
        t0 = t1 = t2 = None
    s0, s1, s2 = FUNNEL_STAGES
    rows = pd.concat(list(pdfs), ignore_index=True)
    # deterministic within-batch replay order; cross-batch order is the
    # engine contract (per-key event-time ordered arrival)
    rows = rows.sort_values(["ts_us", "event_id"])
    for et, ts in zip(rows["event_type"], rows["ts_us"]):
        ts = int(ts)
        if et == s0:
            if t0 is None:
                t0 = ts
        elif et == s1:
            if t1 is None and t0 is not None and ts > t0:
                t1 = ts
        elif et == s2:
            if t2 is None and t1 is not None and ts > t1:
                t2 = ts
    state.update((t0, t1, t2))
    yield pd.DataFrame(
        {"user_id": [key[0]], "t0": [t0], "t1": [t1], "t2": [t2]}
    )


def funnel_chain_stream(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, event_type, ts_us) stream -> per-batch
    current (t0, t1, t2) chain per user with new data."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
