"""Entity/profile keyed aggregations: oracle parity plus the
incremental == batch invariant (SURVEY §5.3) that the streaming upsert
path relies on — folding the fact table in arbitrary splits and merging
must equal the single-pass aggregate bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestprocessstoreinnrt_spark.catalog import load_table
from ingestprocessstoreinnrt_spark.operators import entity
from tests.conftest import SF_ORACLE
from tests.test_bi import _compare


def test_entity_matches_oracle(spark, duck):
    _compare(spark, duck, "entity_customer_rollup")


def test_profile_matches_oracle(spark, duck):
    _compare(spark, duck, "profile_user_rollup")


def _rows_by_key(df, key):
    return {r[key]: tuple(r) for r in df.collect()}


def test_entity_incremental_equals_batch(spark):
    orders = load_table(spark, SF_ORACLE, "orders").cache()
    batch = entity.entity_from_orders(orders)

    # split on an arbitrary hash -> three uneven "micro-batches"
    splits = [
        orders.filter(F.pmod(F.xxhash64("o_orderkey"), F.lit(3)) == i)
        for i in range(3)
    ]
    parts = [entity.entity_from_orders(s) for s in splits]
    merged = entity.merge_entities(*parts)

    b = _rows_by_key(batch.select(*sorted(batch.columns)), "o_custkey")
    m = _rows_by_key(merged.select(*sorted(batch.columns)), "o_custkey")
    assert set(b) == set(m)
    diffs = [k for k in b if b[k] != m[k]]
    assert not diffs, f"{len(diffs)} keys differ, e.g. {b[diffs[0]]} vs {m[diffs[0]]}"
    orders.unpersist()


def test_entity_merge_single_part_is_identity(spark):
    orders = load_table(spark, SF_ORACLE, "orders")
    one = entity.entity_from_orders(orders)
    merged = entity.merge_entities(one)
    b = _rows_by_key(one.select(*sorted(one.columns)), "o_custkey")
    m = _rows_by_key(merged.select(*sorted(one.columns)), "o_custkey")
    assert b == m
