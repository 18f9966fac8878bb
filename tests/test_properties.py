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
