"""Custom stateful streaming operator with CDC flags — the flag-exact
form of the reference's state machine (A2): per key, track whether this
micro-batch Created or Modified the accumulator, so a sink can choose
insert vs update per row (NyTaxiYellowTripStreaming.scala:223-229
`"New"/"Modified"`; ConnectedCarProfile isInsert/hasChanged flags,
ConnectedCarStreaming.scala:111-116).

The default engine path collapses these flags into idempotent MERGE
(streaming/upsert.py) — strictly simpler and exactly-once.  This module
exists for flag-exact parity and as the template for arbitrary
per-key state machines: applyInPandasWithState keeps a dict per key in
the state store; unlike the reference's updateStateByKey, only keys
with new data are invoked (no full state scan per batch), and state
survives restarts via the checkpoint.

Initial-state bootstrap (J1): applyInPandasWithState has no initial-
state argument, so seed state rides in-band — `cdc_entity_stream`'s
`seed_entities` stream is unioned into the input and the state fn folds
it in without counting it as an insert.  (The reference loads a
snapshot and then never wires it — SURVEY 8.2; here it participates.)

ORDERING CAVEAT: the seed only protects a key if it arrives no later
than the key's first stream rows.  With availableNow over a pre-staged
seed directory that holds; with maxFilesPerTrigger or a late-landing
seed file it does not — a key whose trips beat its seed emits New with
trips-only totals until the seed lands.  The robust recipe is a
seed-only priming pass first (run the stream against just the seed
directory to completion, same checkpoint), then attach the live source.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: running totals per key (the taxi-entity minimal slice)
STATE_SCHEMA = "total_trips LONG, total_amount DOUBLE, seeded BOOLEAN"

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("vender_id", T.StringType()),
        T.StructField("total_trips", T.LongType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("cdc_flag", T.StringType()),  # New | Modified
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    trips = 0
    # quantized integer accumulation (1e-4 units) keeps the running
    # total exact under any batch split, like the batch-side dsum()
    amount_q = 0
    seed_trips = 0
    seed_amount_q = 0
    for pdf in pdfs:
        seeds = pdf[pdf["is_seed"]]
        rows = pdf[~pdf["is_seed"]]
        seed_trips += int(seeds["seed_trips"].sum())
        seed_amount_q += int((seeds["seed_amount"] * 10000.0 + 0.5).floordiv(1).sum())
        trips += len(rows)
        amount_q += int((rows["total_amount"] * 10000.0 + 0.5).floordiv(1).sum())

    if state.exists:
        prev_trips, prev_amount, seeded = state.get
        # floor, not int(): int() truncates toward zero, which breaks
        # the quantization round-trip for negative running totals
        prev_q = math.floor(prev_amount * 10000.0 + 0.5)
        is_new = False
    else:
        prev_trips, prev_q, seeded = 0, 0, False
        is_new = True

    if not seeded and (seed_trips or seed_amount_q):
        prev_trips += seed_trips
        prev_q += seed_amount_q
        seeded = True
        # a seeded key pre-exists in the serving table: its first
        # streamed update is a Modified, never a New
        is_new = False

    new_trips = prev_trips + trips
    new_q = prev_q + amount_q
    state.update((new_trips, new_q / 10000.0, seeded))

    if trips == 0:
        return iter([])  # seed-only invocation: nothing to emit
    yield pd.DataFrame(
        {
            "vender_id": [key[0]],
            "total_trips": [new_trips],
            "total_amount": [new_q / 10000.0],
            "cdc_flag": ["New" if is_new else "Modified"],
        }
    )


def _tag(trips: DataFrame, is_seed: bool) -> DataFrame:
    return trips.select(
        "vender_id",
        F.col("total_amount"),
        F.lit(is_seed).alias("is_seed"),
        (F.col("total_trips") if is_seed else F.lit(0)).cast("long").alias(
            "seed_trips"
        ),
        (F.col("total_amount") if is_seed else F.lit(0.0)).alias(
            "seed_amount"
        ),
    )


def cdc_entity_stream(
    trip_stream: DataFrame, seed_entities: DataFrame | None = None
) -> DataFrame:
    """Streaming per-vendor running totals with New/Modified CDC flags.

    trip_stream: streaming trips (vender_id, total_amount per trip).
    seed_entities: optional snapshot of prior entities (vender_id,
    total_trips, total_amount) folded into each key's state on first
    visit.  Must itself be a STREAMING DataFrame (e.g. readStream over
    the snapshot's parquet dir) — Structured Streaming cannot union a
    static frame into a streaming one; reading the snapshot as a
    one-shot file stream is the in-band bootstrap trick.
    """
    tagged = trip_stream.select(
        "vender_id",
        F.col("total_amount"),
        F.lit(False).alias("is_seed"),
        F.lit(0).cast("long").alias("seed_trips"),
        F.lit(0.0).alias("seed_amount"),
    )
    if seed_entities is not None:
        tagged = tagged.unionByName(_tag(seed_entities, True))
    return tagged.groupBy("vender_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
