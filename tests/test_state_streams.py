"""Custom stateful CDC operator (applyInPandasWithState) and the
rate-source telemetry generator."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from ingestprocessstoreinnrt_spark.operators import car
from ingestprocessstoreinnrt_spark.sources import streams
from ingestprocessstoreinnrt_spark.streaming import state as cdc


def _run_batches(spark, workdir, files, seed_df=None):
    """Write trip files one at a time and run the CDC stream after each,
    collecting emitted rows per micro-batch run."""
    src_dir = f"{workdir}/trips"
    out = []
    for i, rows in enumerate(files):
        spark.createDataFrame(rows, ["vender_id", "total_amount"]).coalesce(
            1
        ).write.mode("append").parquet(src_dir)
        schema = spark.read.parquet(src_dir).schema
        stream = spark.readStream.schema(schema).parquet(src_dir)
        seed_stream = None
        if seed_df is not None:
            seed_dir = f"{workdir}/seed"
            if i == 0:
                seed_df.coalesce(1).write.mode("overwrite").parquet(seed_dir)
            seed_stream = spark.readStream.schema(
                spark.read.parquet(seed_dir).schema
            ).parquet(seed_dir)
        agg = cdc.cdc_entity_stream(stream, seed_stream)
        collected: list = []
        q = (
            agg.writeStream.foreachBatch(
                lambda bdf, bid: collected.extend(bdf.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", f"{workdir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out.append(
            {
                r.vender_id: (r.total_trips, r.total_amount, r.cdc_flag)
                for r in collected
            }
        )
    return out

def test_cdc_flags_new_then_modified(spark, tmp_path):
    b1 = [("VTS", 10.0), ("VTS", 5.0), ("CMT", 2.0)]
    b2 = [("VTS", 1.0), ("DDS", 7.0)]
    out = _run_batches(spark, str(tmp_path), [b1, b2])
    assert out[0]["VTS"] == (2, 15.0, "New")
    assert out[0]["CMT"] == (1, 2.0, "New")
    # second run: VTS modified (state persisted via checkpoint), DDS new,
    # CMT untouched -> not emitted
    assert out[1]["VTS"] == (3, 16.0, "Modified")
    assert out[1]["DDS"] == (1, 7.0, "New")
    assert "CMT" not in out[1]


def test_cdc_seed_bootstrap(spark, tmp_path):
    seed = spark.createDataFrame(
        [("VTS", 100, 1000.0)], ["vender_id", "total_trips", "total_amount"]
    )
    out = _run_batches(spark, str(tmp_path), [[("VTS", 5.0)]], seed_df=seed)
    # seeded state participates: 100 prior trips + 1 new; flag is
    # Modified because the key pre-existed in the serving table
    assert out[0]["VTS"] == (101, 1005.0, "Modified")


def test_rate_source_telemetry(spark, tmp_path):
    src = streams.car_telemetry_stream(spark, cars=10, readings_per_second=500)
    q = (
        src.writeStream.format("memory")
        .queryName("telemetry")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM telemetry").first().c
            if n >= 100:
                break
            time.sleep(1)
        assert n >= 100, f"only {n} readings after 30s"
        rows = spark.sql("SELECT * FROM telemetry LIMIT 500").collect()
        assert all(r.speed >= 0 for r in rows)
        assert all(r.vin.startswith("VIN") for r in rows)
        # generated stream feeds the existing profile operator unchanged
        prof = car.profile_from_readings(
            spark.createDataFrame(rows, schema=src.schema)
        )
        assert 0 < prof.count() <= 10
    finally:
        q.stop()
