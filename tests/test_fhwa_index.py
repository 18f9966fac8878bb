"""FHWA parse/enrich pipelines and the search-index document builders."""

from __future__ import annotations

import math
import re

import pytest

from ingestprocessstoreinnrt_spark.operators import fhwa, index
from ingestprocessstoreinnrt_spark.sources import csv_clean, generators

ISO = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$")


@pytest.fixture(scope="module")
def bsm(spark, tmp_path_factory):
    p = generators.write_bsm_csv(
        str(tmp_path_factory.mktemp("bsm") / "p1.csv"), rows=2000, seed=31
    )
    return fhwa.p1_from_lines(spark.read.text(p)).cache()


def test_p1_parse_and_magnitude(bsm):
    assert bsm.count() == 2000
    row = fhwa.enrich_p1(bsm).first()
    assert math.isclose(
        row.a_a, math.sqrt(row.a_x**2 + row.a_y**2 + row.a_z**2), rel_tol=1e-12
    )
    assert row.gen_day_of_week in fhwa.DAY_NAMES.values()
    assert 0 <= row.gen_hour_of_day <= 23


def test_p1_index_documents(bsm):
    docs = fhwa.p1_index_documents(bsm)
    assert docs.count() == 2000
    row = docs.first()
    assert ISO.match(row.gen_time_iso)
    assert row.doc_id.count("-") >= 2


def test_trip_summary_parse_enrich(spark, tmp_path):
    p = generators.write_trip_summary_csv(str(tmp_path / "ts.csv"), rows=500, seed=37)
    ts = fhwa.trip_summary_from_lines(spark.read.text(p))
    assert ts.count() == 500
    row = fhwa.enrich_trip_summary(ts).first()
    assert ISO.match(row.start_iso) and ISO.match(row.end_iso)
    assert row.epoch_end_time > row.epoch_start_time
    assert row.start_day_of_week in fhwa.DAY_NAMES.values()


def test_taxi_trip_documents(spark, tmp_path):
    csv = generators.write_taxi_csv(str(tmp_path / "taxi.csv"), rows=400, seed=41)
    trips = csv_clean.read_taxi_trips(spark, csv)
    docs = index.taxi_trip_documents(trips)
    assert docs.count() == 400
    row = docs.first()
    assert ISO.match(row.pickup_iso)
    assert row.payment_name in csv_clean.PAYMENT_NAME.values() or row.payment_name == "Unknown"


def test_car_event_documents(spark, tmp_path):
    p = generators.write_car_readings_csv(
        str(tmp_path / "car.csv"), cars=10, sweeps=80, seed=43
    )
    readings = csv_clean.read_car_readings(spark, p)
    docs = index.car_event_documents(readings)
    n = docs.count()
    assert 0 < n < readings.count()
    assert set(
        r.event_class for r in docs.select("event_class").distinct().collect()
    ) <= {"collision", "hazard", "illegal_lane_departure"}
