"""Streaming point-in-time features: the applyInPandasWithState twin
of the batch trailing-24h window (operators/windows.py:rolling_24h).

Per user the state store keeps only the events still inside the
trailing window of the newest event seen (bounded state: at most the
key's 24h activity, evicted as time advances).  Each micro-batch emits
one feature row per incoming event — the same (count, exact quantized
sum) the batch RANGE frame computes, so a feature store fed by this
stream serves values bit-identical to offline training features
computed in batch.  The equality is asserted in
tests/test_feature_ops.py over a chunked replay of the events table.

Ordering contract: per-key timestamps must be STRICTLY increasing
across micro-batch boundaries — all events sharing a (user_id, ts)
must arrive in the SAME micro-batch (in-batch disorder is handled by
sorting, and in-batch equal-ts peers are mutually visible like the
batch RANGE frame's peer rows).  If an equal-ts peer arrived in a
LATER batch, the earlier event's already-emitted features would
undercount its peers, and append mode cannot re-emit a correction —
so ``_update`` fails fast on any cross-batch ts regression or tie
rather than silently breaking the online==offline guarantee.
Time-chunked file sources that cut only between distinct timestamps
satisfy this; an out-of-order source needs a watermark-buffered
variant.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.windows import ROLL_US

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("n_24h", T.LongType()),
        T.StructField("value_24h", T.DoubleType()),
    ]
)

STATE_SCHEMA = "ts_list ARRAY<LONG>, qv_list ARRAY<LONG>"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts_us", "event_id"], kind="mergesort")

    if state.exists:
        ts_hist, qv_hist = state.get
        ts_hist, qv_hist = list(ts_hist), list(qv_hist)
    else:
        ts_hist, qv_hist = [], []

    # contract guard: a ts <= the previous batches' max means an event
    # whose features were already emitted is missing a peer/ancestor —
    # unrecoverable in append mode, so fail loudly instead of serving
    # features that no longer match the batch RANGE frame
    if ts_hist and rows["ts_us"].iat[0] <= max(ts_hist):
        raise ValueError(
            f"rolling_features_stream: key {key[0]} received ts "
            f"{int(rows['ts_us'].iat[0])} <= already-emitted max "
            f"{max(ts_hist)}; per-key timestamps must be strictly "
            "increasing across micro-batches (equal-ts peers must "
            "share a batch)"
        )

    # append the whole batch FIRST: equal-ts peers must see each other
    # (the batch RANGE frame includes peer rows), then score per event
    new_ts = rows["ts_us"].tolist()
    new_qv = [
        math.floor(v * 10000.0 + 0.5) for v in rows["value"].tolist()
    ]
    ts_all = ts_hist + new_ts
    qv_all = qv_hist + new_qv

    out_n, out_v = [], []
    for t in new_ts:
        lo = t - ROLL_US + 1
        n = q = 0
        for ts, qv in zip(ts_all, qv_all):
            if lo <= ts <= t:
                n += 1
                q += qv
        out_n.append(n)
        out_v.append(q / 10000.0)

    # evict entries no future (in-order) event can see
    hi = max(ts_all)
    keep_lo = hi - ROLL_US + 1
    kept = [(ts, qv) for ts, qv in zip(ts_all, qv_all) if ts >= keep_lo]
    state.update(
        ([ts for ts, _ in kept], [qv for _, qv in kept])
    )

    yield pd.DataFrame(
        {
            "user_id": [int(key[0])] * len(new_ts),
            "event_id": rows["event_id"].tolist(),
            "n_24h": out_n,
            "value_24h": out_v,
        }
    )


WM_STATE_SCHEMA = (
    "pend_ts ARRAY<LONG>, pend_eid ARRAY<LONG>, pend_qv ARRAY<LONG>, "
    "hist_ts ARRAY<LONG>, hist_qv ARRAY<LONG>"
)


def _score(ts_all, qv_all, ripe):
    """Batch-RANGE-frame features for each (ts, eid, qv) in `ripe`
    against the combined population `ts_all/qv_all`."""
    out_eid, out_n, out_v = [], [], []
    for t, eid, _ in ripe:
        lo = t - ROLL_US + 1
        n = q = 0
        for ts, qv in zip(ts_all, qv_all):
            if lo <= ts <= t:
                n += 1
                q += qv
        out_eid.append(eid)
        out_n.append(n)
        out_v.append(q / 10000.0)
    return out_eid, out_n, out_v


def _update_watermarked(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Out-of-order-tolerant twin of _update: buffer events in state
    and emit features only once the WATERMARK has passed their
    timestamp — at that point every peer that will ever count (any
    event not dropped as late) has arrived, so the emitted value
    equals the batch RANGE frame without any cross-batch ordering
    contract.  Spark's late-row filter drops events at or below the
    watermark before they reach this function, which is exactly the
    boundary that makes the buffered set complete."""
    if state.exists:
        p_ts, p_eid, p_qv, h_ts, h_qv = (list(x) for x in state.get)
    else:
        p_ts, p_eid, p_qv, h_ts, h_qv = [], [], [], [], []

    for pdf in pdfs:
        p_ts.extend(int(t) for t in pdf["ts_us"])
        p_eid.extend(int(e) for e in pdf["event_id"])
        p_qv.extend(
            math.floor(v * 10000.0 + 0.5) for v in pdf["value"]
        )

    wm_us = state.getCurrentWatermarkMs() * 1000
    pend = sorted(zip(p_ts, p_eid, p_qv))
    ripe = [e for e in pend if e[0] <= wm_us]
    rest = [e for e in pend if e[0] > wm_us]

    if ripe:
        ts_all = h_ts + [t for t, _, _ in ripe]
        qv_all = h_qv + [q for _, _, q in ripe]
        out_eid, out_n, out_v = _score(ts_all, qv_all, ripe)
        # ripe events join the history; anything no future event can
        # see (future ts > wm by the late filter) is evicted
        keep_lo = wm_us - ROLL_US + 1
        h = [
            (t, q)
            for t, q in zip(ts_all, qv_all)
            if t >= keep_lo
        ]
        h_ts, h_qv = [t for t, _ in h], [q for _, q in h]
    else:
        out_eid, out_n, out_v = [], [], []

    state.update(
        (
            [t for t, _, _ in rest],
            [e for _, e, _ in rest],
            [q for _, _, q in rest],
            h_ts,
            h_qv,
        )
    )
    if rest:
        # wake this key when the watermark passes its oldest pending
        # event, even if no new data arrives for it
        state.setTimeoutTimestamp(
            max(rest[0][0] // 1000, wm_us // 1000 + 1)
        )

    yield pd.DataFrame(
        {
            "user_id": [int(key[0])] * len(out_eid),
            "event_id": out_eid,
            "n_24h": out_n,
            "value_24h": out_v,
        }
    )


def rolling_features_stream_watermarked(
    events: DataFrame, delay: str = "30 minutes"
) -> DataFrame:
    """Rolling features over an OUT-OF-ORDER stream: events may arrive
    in any order within `delay` of the newest seen; emission waits for
    the watermark, so online == offline holds with no per-key ordering
    contract (the strict-order variant above trades this latency for
    immediate emission).  State per key: the trailing window's history
    plus at most `delay` worth of pending events."""
    prepped = events.withWatermark("ts", delay).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "ts",
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update_watermarked,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=WM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def rolling_features_stream(events: DataFrame) -> DataFrame:
    """events: streaming (user_id, event_id, ts, value) -> one feature
    row per event, state bounded to each key's trailing window."""
    prepped = events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
