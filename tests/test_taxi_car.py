"""Reference-shaped verticals: 2009 taxi CSV cleaning -> typed trips ->
entity aggregation (DuckDB-verified), and car telemetry -> profile
(pure-Python-verified exact semantics)."""

from __future__ import annotations

import csv
import math

import duckdb
import pytest

from ingestprocessstoreinnrt_spark.functions.scalars import sql_dsum
from ingestprocessstoreinnrt_spark.operators import car, taxi
from ingestprocessstoreinnrt_spark.sources import csv_clean, generators

N_TAXI = 3000


@pytest.fixture(scope="module")
def taxi_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("taxi") / "yellow_2009.csv"
    return generators.write_taxi_csv(str(p), rows=N_TAXI, seed=7)


@pytest.fixture(scope="module")
def trips(spark, taxi_csv):
    return csv_clean.read_taxi_trips(spark, taxi_csv).cache()


def test_cleaning_rules(spark, trips, taxi_csv):
    # header + blank lines are skipped: every data row survives
    assert trips.count() == N_TAXI
    row = trips.first()
    assert row.payment_type in {"1", "2", "3", "4", "5", "6"}
    # empty numeric cells defaulted to 0.0, never null
    assert trips.filter("trip_distance IS NULL OR fare_amount IS NULL").count() == 0
    # timestamps parsed to epoch millis in 2009
    assert trips.filter("tpep_pickup_datetime < 1230768000000").count() == 0
    # dirty inputs: a malformed row (<=3 cells) and a short row are dropped
    extra = spark.createDataFrame(
        [("a,b,c",), ("xx",), ("vendor_name,zzz,yyy,www,qqq",)], ["value"]
    )
    assert csv_clean.taxi_trips_from_lines(extra).count() == 0


def test_taxi_entity_matches_duckdb(tmp_path, trips):
    pq = str(tmp_path / "trips.parquet")
    trips.write.mode("overwrite").parquet(pq)
    ent = taxi.entity_from_trips(trips)
    cols = sorted(ent.columns)
    got = {
        r["vender_id"]: tuple(r[c] for c in cols) for r in ent.collect()
    }

    gated = []
    for gate, stem in (("1", "credit_card"), ("2", "cash")):
        for out_name, col in taxi._MEASURES.items():
            expr = f"CASE WHEN payment_type = '{gate}' THEN {col} END"
            gated.append(
                f"COALESCE({sql_dsum(expr, 'x').replace(' AS x', '')}, 0.0)"
                f" AS total_{stem}_{out_name}"
            )
    counters = [
        f"CAST(SUM(CASE WHEN payment_type = '{code}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS total_{name}_trips"
        for code, name in taxi._CODE_NAMES.items()
    ]
    sql = f"""
      SELECT vender_id,
             COUNT(*) AS total_trips,
             CAST(SUM(passenger_count) AS BIGINT) AS total_passengers,
             {sql_dsum('trip_distance', 'total_distance_of_trips')},
             MAX(trip_distance) AS max_distance_of_trip,
             {', '.join(gated)},
             {', '.join(counters)}
      FROM read_parquet('{pq}/*.parquet') GROUP BY vender_id
    """
    res = duckdb.sql(sql)
    dcols = [d[0] for d in res.description]
    want = {}
    for r in res.fetchall():
        d = dict(zip(dcols, r))
        want[d["vender_id"]] = tuple(d[c] for c in cols)
    assert got == want


def test_taxi_bi_queries_run(trips):
    assert taxi.payment_type_rollup(trips).count() > 0
    top = taxi.top_ten_vendors(trips).collect()
    counts = [r.trip_count for r in top]
    assert counts == sorted(counts, reverse=True)
    assert taxi.trip_per_time_of_day(trips, 3).count() > 0
    assert taxi.vendor_trip_history(trips, "VTS").count() > 0


# --- connected car ---------------------------------------------------------


@pytest.fixture(scope="module")
def car_csv(tmp_path_factory):
    p = tmp_path_factory.mktemp("car") / "readings.csv"
    return generators.write_car_readings_csv(
        str(p), cars=20, sweeps=100, seed=11, error_mode=True
    )


def _python_profile(path):
    """Independent pure-Python computation of the profile semantics."""
    per = {}
    with open(path) as f:
        for row in csv.reader(f):
            t, vin = int(row[0]), row[1]
            speed = int(row[6])
            if not vin or speed < 0:
                continue
            s = per.setdefault(
                vin,
                dict(acc=[], dec=[], hand=[], speeds=[], miles=0, pm=0,
                     col=0, haz=0, brk=0, n=0, last=0),
            )
            miles, x, y = int(row[2]), float(row[3]), float(row[4])
            brakes, signal, lane = (row[7] == "true"), (row[8] == "true"), (row[9] == "true")
            collision, hazard = (row[10] == "true"), (row[11] == "true")
            s["miles"] = max(s["miles"], miles)
            (s["acc"] if y > 0 else s["dec"]).append(y if y > 0 else abs(y))
            s["hand"].append(abs(x))
            s["speeds"].append(speed)
            if lane:
                s["pm"] += -1 if signal else 1
            s["col"] += collision
            s["haz"] += hazard
            s["brk"] += brakes
            s["n"] += 1
            s["last"] = max(s["last"], t)
    out = {}
    for vin, s in per.items():
        mean = lambda xs: sum(xs) / len(xs) if xs else 0.0
        a, b, h = mean(s["acc"]), mean(s["dec"]), mean(s["hand"])
        clampi = lambda x, lo, hi: max(lo, min(hi, x))
        out[vin] = dict(
            miles_count=s["miles"],
            acceleration_aggression_score=a,
            braking_aggression_score=b,
            handling_aggression_score=h,
            overall_aggression_score=a + b + h,
            average_speed=int(mean(s["speeds"])),
            illegal_lane_departure_plus_minus=s["pm"],
            collisions_count=s["col"],
            hazards_detected_count=s["haz"],
            brakes_applied_count=s["brk"],
            readings_count=s["n"],
            accelerating_readings_count=len(s["acc"]),
            decelerating_readings_count=len(s["dec"]),
            last_updated=s["last"],
            oil_replacement_period=clampi(5000 - int((a - 2) * 5000), 500, 10000),
            brake_replacement_period=clampi(30000 - int((b - 1) * 15000), 1000, 50000),
            tire_replacement_period=clampi(30000 - int((h - 0.5) * 25000), 1000, 50000),
        )
    return out


def test_car_profile_exact_semantics(spark, car_csv):
    readings = csv_clean.read_car_readings(spark, car_csv)
    prof = car.profile_from_readings(readings)
    got = {r.vin: r.asDict() for r in prof.collect()}
    want = _python_profile(car_csv)
    assert set(got) == set(want)
    for vin, w in want.items():
        g = got[vin]
        for k, v in w.items():
            if isinstance(v, float):
                assert math.isclose(g[k], v, rel_tol=1e-9), (vin, k, g[k], v)
            else:
                assert g[k] == v, (vin, k, g[k], v)


def test_car_event_filter(spark, car_csv):
    readings = csv_clean.read_car_readings(spark, car_csv)
    ev = car.event_filter(readings)
    n = ev.count()
    assert 0 < n < readings.count()
    bad = ev.filter(
        "NOT (collision_detected OR hazard_detected OR (lane_departed AND NOT signal_on))"
    )
    assert bad.count() == 0
