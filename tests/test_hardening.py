"""Regression tests for the ANSI-safety / ledger-namespace / UPDATE
hardening pass: malformed cells must degrade to null/default instead of
throwing under Spark 4 ANSI mode, exactly-once ledgers must not collide
across checkpoints, and Engine.update must follow SQL simultaneous-
assignment semantics."""

from __future__ import annotations

import pytest

from ingestprocessstoreinnrt_spark.engine import Engine
from ingestprocessstoreinnrt_spark.functions.scalars import parse_ts_millis, safe_num
from ingestprocessstoreinnrt_spark.sources import csv_clean
from ingestprocessstoreinnrt_spark.streaming.upsert import UpsertTable

SF = "/root/testdata/sf0.001"


def test_safe_num_malformed_yields_null_not_throw(spark):
    df = spark.createDataFrame(
        [("N/A",), ("12.5",), ("",), ("1e3",), ("nonsense",)], ["v"]
    )
    out = df.select(safe_num("v", "double").alias("d")).collect()
    assert [r.d for r in out] == [None, 12.5, 0.0, 1000.0, None]


def test_parse_ts_malformed_yields_null(spark):
    df = spark.createDataFrame(
        [("2009-01-15 13:45:00",), ("not-a-time",), ("",)], ["t"]
    )
    out = df.select(parse_ts_millis("t").alias("ms")).collect()
    assert out[0].ms == 1232027100000  # 24h parse (13:45, not 01:45)
    assert out[1].ms is None and out[2].ms is None


def test_short_but_legal_taxi_line_survives(spark):
    # >3 cells passes the reference's malformed filter, but indices past
    # the end must read as defaulted 0 / null — not ANSI-throw at cells[17]
    line = "VTS,2009-01-15 10:00:00,2009-01-15 10:10:00,2,3.5"
    trips = csv_clean.taxi_trips_from_lines(
        spark.createDataFrame([(line,)], ["value"])
    )
    row = trips.collect()[0]
    assert row.vender_id == "VTS"
    assert row.trip_distance == 3.5
    assert row.total_amount == 0.0  # cell 17 absent -> defaulted
    assert row.payment_type == "5"  # absent payment -> Unknown code


def test_taxi_line_with_garbage_numeric_cell(spark):
    # 18 cells but a non-numeric fare: row survives, fare is null
    cells = ["VTS", "2009-01-15 10:00:00", "2009-01-15 10:10:00", "1",
             "2.0", "-73.9", "40.7", "", "", "-73.8", "40.6",
             "CASH", "oops", "0.5", "", "0", "0", "10.0"]
    trips = csv_clean.taxi_trips_from_lines(
        spark.createDataFrame([(",".join(cells),)], ["value"])
    )
    row = trips.collect()[0]
    assert row.payment_type == "2"  # CASH normalized
    assert row.fare_amount is None
    assert row.total_amount == 10.0


def test_ledger_namespace_isolates_checkpoints(spark, tmp_path):
    t = UpsertTable(spark, str(tmp_path / "t"), ["k"], num_buckets=4)
    mk = lambda rows: spark.createDataFrame(rows, ["k", "v"])
    # first "run" applies batch 0
    t.apply_batch(0, mk([(1, "a")]), namespace="runA")
    # a fresh checkpoint restarts ids at 0 — must NOT be skipped
    t.apply_batch(0, mk([(2, "b")]), namespace="runB")
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(1, "a"), (2, "b")]
    # replay within the same namespace IS skipped (exactly-once)
    t.apply_batch(0, mk([(1, "SHOULD_NOT_APPLY")]), namespace="runA")
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(1, "a"), (2, "b")]


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, SF, str(tmp_path / "wh"))


def test_update_simultaneous_assignment(engine, spark):
    engine.create_table("t", ["k"], num_buckets=4)
    engine.insert_values("t", [(1, 10, 20), (2, 1, 2)], ["k", "a", "b"])
    # SQL UPDATE: both RHS see the pre-update row -> values swap
    engine.update("t", "k = 1", {"a": "b", "b": "a"})
    got = {r.k: (r.a, r.b) for r in engine.table("t").collect()}
    assert got == {1: (20, 10), 2: (1, 2)}


def test_update_rejects_primary_key_assignment(engine):
    engine.create_table("u", ["k"], num_buckets=4)
    engine.insert_values("u", [(1, 10)], ["k", "a"])
    with pytest.raises(ValueError, match="primary key"):
        engine.update("u", "a = 10", {"k": "k + 100"})


def test_update_rejects_unknown_column(engine):
    engine.create_table("v", ["k"], num_buckets=4)
    engine.insert_values("v", [(1, 10)], ["k", "a"])
    with pytest.raises(ValueError, match="unknown column"):
        engine.update("v", "k = 1", {"totl": "0"})  # typo must not no-op


def test_ledger_namespace_is_path_canonical(tmp_path, monkeypatch):
    """Different spellings of the same checkpoint dir must share a
    ledger namespace, or a restart double-merges replayed batch ids."""
    from ingestprocessstoreinnrt_spark.streaming.pipelines import (
        checkpoint_namespace,
    )

    monkeypatch.chdir(tmp_path)
    absolute = str(tmp_path / "ckpt")
    assert (
        checkpoint_namespace("ckpt/")
        == checkpoint_namespace("./ckpt")
        == checkpoint_namespace(absolute)
    )
    assert checkpoint_namespace("ckpt") != checkpoint_namespace("other")


def test_bench_latest_record_is_quiet_box_only():
    """VERDICT r10 'what's wrong' #3: the canonical
    BENCH_full_latest.json was overwritten by a load-3.24 run in
    violation of the round-10 record protocol.  bench.record_path now
    enforces the rule in code: quiet runs (load < 1) own the latest
    file; contended runs are diverted to a load-stamped side file."""
    import bench

    assert bench.record_path("/r", 0.0).endswith("BENCH_full_latest.json")
    assert bench.record_path("/r", 0.99).endswith("BENCH_full_latest.json")
    for load in (1.0, 3.24, 7.5):
        p = bench.record_path("/r", load)
        assert "BENCH_full_latest" not in p
        assert "contended" in p
    # distinct loads -> distinct side files (no silent clobber)
    assert bench.record_path("/r", 3.24) != bench.record_path("/r", 1.02)
    # non-canonical scales never wear the latest name, quiet or not
    assert bench.record_path("/r", 0.1, "1").endswith(
        "BENCH_full_sf1.json"
    )
    p10 = bench.record_path("/r", 2.0, "10")
    assert "latest" not in p10 and "sf10" in p10 and "contended" in p10
    # ADVICE r11: same rounded load tag from two runs must not clobber —
    # the pid uniquifier lands in CONTENDED names only; quiet/canonical
    # names stay stable regardless of uniq
    a = bench.record_path("/r", 3.24, uniq="111")
    b = bench.record_path("/r", 3.24, uniq="222")
    assert a != b and "contended" in a
    assert bench.record_path("/r", 0.5, uniq="111").endswith(
        "BENCH_full_latest.json"
    )
    assert bench.record_path("/r", 0.5, "1", uniq="111").endswith(
        "BENCH_full_sf1.json"
    )
