"""Property-based tests (SURVEY §5.4): fold-order invariance of the
keyed-aggregate merge, upsert idempotency under replay, and cross-engine
portability of the quantization primitive.

hypothesis drives the data; examples are kept small because each one
runs real Spark jobs.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from ingestprocessstoreinnrt_spark.operators import entity
from ingestprocessstoreinnrt_spark.streaming.upsert import UpsertTable

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from ingestprocessstoreinnrt_spark.session import get_spark

        _spark = get_spark("props")
    return _spark


orders_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # o_custkey (few keys)
        st.floats(
            min_value=0.01, max_value=9999.99, allow_nan=False, width=64
        ),  # o_totalprice
        st.sampled_from(["O", "F", "P"]),  # o_orderstatus
        st.sampled_from(["1-URGENT", "3-MEDIUM", "5-LOW"]),  # priority
    ),
    min_size=2,
    max_size=30,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=orders_rows, split_seed=st.integers(0, 2**31 - 1))
def test_merge_is_fold_order_invariant(rows, split_seed):
    """entity(parts merged in any split) == entity(all rows), bit-exact:
    the invariant that lets micro-batches of ANY composition reproduce
    the batch rollup."""
    spark = _get_spark()
    cols = ["o_custkey", "o_totalprice", "o_orderstatus", "o_orderpriority"]
    df = spark.createDataFrame(rows, cols)
    batch = entity.entity_from_orders(df)

    import random

    rng = random.Random(split_seed)
    assignment = [rng.randrange(3) for _ in rows]
    parts = []
    for i in range(3):
        sub = [r for r, a in zip(rows, assignment) if a == i]
        if sub:
            parts.append(entity.entity_from_orders(spark.createDataFrame(sub, cols)))
    merged = entity.merge_entities(*parts)

    key = lambda d: {  # noqa: E731
        r["o_custkey"]: tuple(r[c] for c in sorted(batch.columns))
        for r in d.collect()
    }
    assert key(batch) == key(merged)


@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 10), st.text(min_size=1, max_size=5)),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    )
)
def test_upsert_idempotent_under_replay(rows):
    import tempfile

    spark = _get_spark()
    t = UpsertTable(spark, tempfile.mkdtemp(), ["k"], num_buckets=4)
    df = spark.createDataFrame(rows, ["k", "v"])
    t.init(df)
    t.upsert(df)  # at-least-once redelivery of identical rows
    t.upsert(df)
    assert sorted(tuple(r) for r in t.read().collect()) == sorted(rows)


@settings(max_examples=3, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    xs=st.lists(
        st.floats(
            min_value=-1e8, max_value=1e8, allow_nan=False, width=64
        ),
        min_size=1,
        max_size=200,
    )
)
def test_quantize_matches_reference_semantics(xs):
    """Spark's floor(x*1e4+0.5) must equal Python's — both are IEEE
    doubles, so any divergence means an engine is doing something
    nonportable (this is the primitive all exact aggregates rest on)."""
    spark = _get_spark()
    from pyspark.sql import functions as F
    from ingestprocessstoreinnrt_spark.functions.scalars import quantize

    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    got = [r.q for r in df.select(quantize(F.col("x")).alias("q")).collect()]
    want = [math.floor(x * 10000.0 + 0.5) for x in xs]
    assert got == want


texts = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "x", "yy", "zzz"]),
        min_size=0,
        max_size=150,
    ).map(" ".join),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(docs=texts)
def test_chunking_tiles_any_corpus(docs):
    """For arbitrary token streams: chunk starts advance by the stride,
    every chunk is the exact slice of the original tokens, and
    concatenating chunks minus overlaps reconstructs the document."""
    from ingestprocessstoreinnrt_spark.operators import curation

    spark = _get_spark()
    frame = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    rows = curation.chunk_frame(frame).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in enumerate(docs):
        want = text.split() if text.strip() else []
        cs = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_idx)
        if not want:
            assert cs == []
            continue
        for i, c in enumerate(cs):
            assert c.chunk_start == i * curation.CHUNK_STRIDE
            # each chunk is the EXACT slice of the original stream, so
            # slice equality + end coverage imply full reconstruction
            assert (
                c.chunk_text.split()
                == want[c.chunk_start : c.chunk_start + curation.CHUNK_TOKENS]
            )
        # coverage: last chunk reaches the last token
        last = cs[-1]
        assert last.chunk_start + last.n_chunk_tokens == len(want)


pii_fragments = st.lists(
    st.sampled_from(
        [
            "plain words here",
            "user.name+tag@example-host.org",
            "call 415-555-0134",
            "10.0.3.77",
            "not@an",  # no TLD -> not an email
            "12-34",  # not a phone
            "1.2.3",  # not an IPv4
        ]
    ),
    min_size=0,
    max_size=8,
).map(" ".join)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(xs=st.lists(pii_fragments, min_size=1, max_size=15))
def test_pii_redaction_idempotent(xs):
    """redact(redact(x)) == redact(x) for arbitrary mixes of PII and
    near-PII — placeholders never re-match and partial patterns are
    left alone (checked on the Spark/Java regex engine itself)."""
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.operators import curation

    spark = _get_spark()
    frame = spark.createDataFrame([(x,) for x in xs], "text string")
    rows = frame.select(
        curation.redact(F.col("text")).alias("once"),
    ).select(
        "once", curation.redact(F.col("once")).alias("twice")
    ).collect()
    for r in rows:
        assert r.once == r.twice


events_with_ts_collisions = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=6),  # ts slot (collisions!)
        st.sampled_from(["a", "b", "c"]),  # event_type
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=events_with_ts_collisions)
def test_scd2_matches_bruteforce_under_collisions(rows):
    """_scd2_from == a python reference (collapse same-ts to max
    event_id, then change points) for arbitrary collision patterns."""
    from ingestprocessstoreinnrt_spark.operators import cdc

    spark = _get_spark()
    data = [
        (u, eid, typ, ts * 1_000_000)
        for eid, (u, ts, typ) in enumerate(rows)
    ]
    frame = spark.createDataFrame(
        data, "user_id long, event_id long, event_type string, ts_us long"
    )
    got = sorted(
        (r.user_id, r.version, r.event_type, r.valid_from_us, r.valid_to_us)
        for r in cdc._scd2_from(frame).collect()
    )

    # python reference
    want = []
    by_user: dict = {}
    for u, eid, typ, ts in data:
        by_user.setdefault(u, {})
        cur = by_user[u].get(ts)
        if cur is None or eid > cur[0]:
            by_user[u][ts] = (eid, typ)  # last event_id wins per ts
    for u, at_ts in by_user.items():
        hist = sorted(at_ts.items())  # by ts
        prev_typ, version = None, 0
        changes = []
        for ts, (_, typ) in hist:
            if typ != prev_typ:
                changes.append([ts, typ])
            prev_typ = typ
        for i, (ts, typ) in enumerate(changes):
            version += 1
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            want.append((u, version, typ, ts, nxt))
    assert got == sorted(want)


day_sets = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=4),     # user_id
        st.integers(min_value=0, max_value=40),    # day
    ),
    min_size=1,
    max_size=60,
    unique=True,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(pairs=day_sets)
def test_streaks_property(pairs):
    """Gaps-and-islands over ARBITRARY (user, day) sets matches the
    linear-scan reference: longest run, run count, active days."""
    from ingestprocessstoreinnrt_spark.operators import windows as W

    spark = _get_spark()
    grain = spark.createDataFrame(pairs, "user_id long, day long")
    got = {r.user_id: r for r in W.streaks_of(grain).collect()}
    by_user: dict = {}
    for u, d in pairs:
        by_user.setdefault(u, set()).add(d)
    assert set(got) == set(by_user)
    for u, ds in by_user.items():
        sd = sorted(ds)
        runs = []
        start = prev = sd[0]
        for d in sd[1:]:
            if d == prev + 1:
                prev = d
            else:
                runs.append((start, prev - start + 1))
                start = prev = d
        runs.append((start, prev - start + 1))
        best = max(runs, key=lambda t: (t[1], -t[0]))
        r = got[u]
        assert r.n_active_days == len(ds)
        assert r.n_streaks == len(runs)
        assert r.longest_streak == best[1]
        assert r.streak_start_day_us == best[0] * W.DAY_US


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1, max_size=80, unique=True,
    ),
    cut=st.integers(min_value=0, max_value=10_000),
)
def test_hll_register_merge_property(ids, cut):
    """For ANY two-way split of an id set, the elementwise MAX of the
    parts' HLL registers equals the whole set's registers — the merge
    law that makes the sketch shardable and streamable."""
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.operators import sketch

    spark = _get_spark()
    df = spark.createDataFrame([(i,) for i in ids], "event_id long")

    def regs(frame):
        return {
            r.j: r.r
            for r in sketch.hll_registers(frame, "event_id").collect()
        }

    lo = regs(df.filter(F.col("event_id") <= cut))
    hi = regs(df.filter(F.col("event_id") > cut))
    merged = {
        j: max(lo.get(j, 0), hi.get(j, 0)) for j in set(lo) | set(hi)
    }
    assert merged == regs(df)


# --- streaming funnel state machine == batch chain semantics ---------------
#
# The incremental update in streaming/funnel.py must agree with the
# batch definition (earliest stage-k event strictly after t_{k-1})
# for ANY event sequence arriving in event-time order under ANY batch
# split.  Pure-Python replicas of both sides; no Spark session needed.

_funnel_events = st.lists(
    st.tuples(
        st.integers(0, 2),          # stage index
        st.integers(0, 30),         # ts
    ),
    min_size=0,
    max_size=25,
)


@given(evs=_funnel_events, n_batches=st.integers(1, 5))
def test_streaming_funnel_update_matches_batch_chain(evs, n_batches):
    stages = ["view", "click", "purchase"]
    # event-time ordered arrival (the engine contract): sort by ts,
    # stable on input order for equal ts
    evs = sorted(evs, key=lambda e: e[1])

    # batch semantics: chained conditional minima over the full set
    t0 = min((ts for s, ts in evs if s == 0), default=None)
    t1 = min(
        (ts for s, ts in evs if s == 1 and t0 is not None and ts > t0),
        default=None,
    )
    t2 = min(
        (ts for s, ts in evs if s == 2 and t1 is not None and ts > t1),
        default=None,
    )

    # streaming semantics: per-batch incremental state machine
    # (streaming/funnel.py:_update's loop body, minus pandas)
    st0 = st1 = st2 = None
    k = max(1, len(evs) // n_batches + 1)
    for i in range(0, max(len(evs), 1), k):
        batch = sorted(evs[i : i + k], key=lambda e: e[1])
        for s, ts in batch:
            if s == 0:
                if st0 is None:
                    st0 = ts
            elif s == 1:
                if st1 is None and st0 is not None and ts > st0:
                    st1 = ts
            elif s == 2:
                if st2 is None and st1 is not None and ts > st1:
                    st2 = ts

    assert (st0, st1, st2) == (t0, t1, t2)
