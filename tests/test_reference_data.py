"""Integration against the reference's OWN shipped data fixtures
(read-only at /root/reference/data/ny_taxi/): the cleaning rules,
entity aggregation, and BI queries must work on the exact files the
reference replays through Kafka (README.md:31-32) — header line,
interleaved blanks, empty cells, mixed-case string payment types and
all.  This is the 'a user of the reference could switch' test."""

from __future__ import annotations

import os

import duckdb
import pytest

from ingestprocessstoreinnrt_spark.operators import index, taxi
from ingestprocessstoreinnrt_spark.sources import csv_clean

REF_100 = "/root/reference/data/ny_taxi/yellow_tripdata_2009-01.100.csv"
REF_10K = "/root/reference/data/ny_taxi/yellow_tripdata_2009-01.10000.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_10K), reason="reference fixtures not present"
)


@pytest.fixture(scope="module")
def ref_trips(spark):
    return csv_clean.read_taxi_trips(spark, REF_10K).cache()


def test_reference_csv_parses_fully(spark, ref_trips):
    # count data lines ourselves: non-blank, non-header, >3 cells
    with open(REF_10K) as f:
        expected = sum(
            1
            for ln in f
            if ln.strip()
            and not ln.startswith("vendor_name")
            and len(ln) >= 10
            and ln.count(",") > 3
        )
    assert ref_trips.count() == expected
    # 2009 string payment types normalized to numeric codes
    codes = {r.payment_type for r in ref_trips.select("payment_type").distinct().collect()}
    assert codes <= {"1", "2", "3", "4", "5", "6"}
    # the reference's own data has CASH/Credit/No Charge spellings
    assert "1" in codes and "2" in codes
    # empty numeric cells (mta_tax etc.) defaulted, never null
    assert ref_trips.filter("mta_tax IS NULL OR trip_distance IS NULL").count() == 0
    # timestamps in January 2009 epoch-millis range
    assert (
        ref_trips.filter(
            "tpep_pickup_datetime < 1230768000000 OR tpep_pickup_datetime > 1233529200000"
        ).count()
        == 0
    )


def test_reference_entity_matches_duckdb(tmp_path, ref_trips):
    pq = str(tmp_path / "ref_trips.parquet")
    ref_trips.write.mode("overwrite").parquet(pq)
    ent = taxi.entity_from_trips(ref_trips)
    cols = sorted(ent.columns)
    got = {r["vender_id"]: tuple(r[c] for c in cols) for r in ent.collect()}
    from ingestprocessstoreinnrt_spark.functions.scalars import sql_dsum

    gated = []
    for gate, stem in (("1", "credit_card"), ("2", "cash")):
        for out_name, col in taxi._MEASURES.items():
            expr = f"CASE WHEN payment_type = '{gate}' THEN {col} END"
            gated.append(
                f"COALESCE({sql_dsum(expr, 'x').replace(' AS x', '')}, 0.0)"
                f" AS total_{stem}_{out_name}"
            )
    counters = [
        f"CAST(SUM(CASE WHEN payment_type = '{c}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS total_{n}_trips"
        for c, n in taxi._CODE_NAMES.items()
    ]
    res = duckdb.sql(
        f"""SELECT vender_id, COUNT(*) AS total_trips,
            CAST(SUM(passenger_count) AS BIGINT) AS total_passengers,
            {sql_dsum('trip_distance', 'total_distance_of_trips')},
            MAX(trip_distance) AS max_distance_of_trip,
            {', '.join(gated)}, {', '.join(counters)}
            FROM read_parquet('{pq}/*.parquet') GROUP BY vender_id"""
    )
    dcols = [d[0] for d in res.description]
    want = {}
    for r in res.fetchall():
        d = dict(zip(dcols, r))
        want[d["vender_id"]] = tuple(d[c] for c in cols)
    assert got == want


def test_reference_bi_queries(ref_trips):
    rollup = taxi.payment_type_rollup(ref_trips)
    assert rollup.count() > 0
    top = taxi.top_ten_vendors(ref_trips).collect()
    assert [r.trip_count for r in top] == sorted(
        (r.trip_count for r in top), reverse=True
    )
    # cash dominates 2009 data — sanity of the payment normalization
    cash = taxi.entity_from_trips(ref_trips).agg(
        {"total_cash_trips": "sum", "total_trips": "sum"}
    ).first()
    assert cash["sum(total_cash_trips)"] > 0.5 * cash["sum(total_trips)"]
    docs = index.taxi_trip_documents(ref_trips)
    assert docs.count() == ref_trips.count()


def test_documents_ascii():
    """The multimodal frame oracle (_FRAME_SQL) mixes byte-based
    strlen with character-based substr; it is cell-exact only while
    the documents corpus is pure ASCII (DuckDB cannot slice BLOBs).
    Guard that assumption at every sf the driver touches."""
    import duckdb

    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = con.execute(
            f"SELECT COUNT(*) FROM '/root/testdata/{sf}/documents.parquet'"
            " WHERE strlen(text) <> length(text)"
        ).fetchone()[0]
        assert n == 0, f"{sf}: {n} non-ASCII documents break _FRAME_SQL"
