"""Streaming sources (S1/S6): Kafka CSV lines (see
streaming.pipelines.kafka_lines_stream) and the rate-source synthetic
telemetry generator — the Structured-Streaming form of the reference's
driver-side 1 Hz generator (ConnectedCarReadingGenerator.scala:42-53):
instead of a Python loop sleeping between sweeps, the rate source emits
rows at a configured rate and column expressions synthesize the
reading — fully distributed, backpressure-aware, deterministic per
(timestamp, value) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def car_telemetry_stream(
    spark: SparkSession,
    cars: int = 100,
    readings_per_second: int = 100,
) -> DataFrame:
    """Synthetic car telemetry as a streaming DataFrame
    (schemas.CAR_READING shape).  Derivations mirror the reference
    generator's models: Gaussian-ish jitter from a hash-derived uniform,
    speed ~ N(avg,5) clamped >= 0 (:103-110), lane departure p=0.02
    (:117-120), brakes p=0.1 (:112-115), hazard p=0.001 (:139-142)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(readings_per_second))
        .load()
    )  # columns: timestamp, value (monotone long)
    car_idx = (F.col("value") % cars).cast("int")
    # deterministic pseudo-uniforms in [0,1) from the row id
    u = lambda salt: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("value"), F.lit(salt)), F.lit(1_000_000))
        / 1_000_000.0
    )
    base_speed = (25 + F.pmod(F.xxhash64(car_idx), F.lit(56))).cast("double")
    return rate.select(
        F.unix_millis("timestamp").alias("time"),
        F.format_string("VIN%05d", car_idx).alias("vin"),
        (1000 + F.col("value") * 37 % 150000).cast("long").alias("miles"),
        (u("xa") * 2 - 1 + 0.5).alias("x_accel"),
        (u("ya") * 6 - 3).alias("y_accel"),
        F.lit(0.0).alias("z_accel"),
        F.greatest(
            F.lit(0), (base_speed + (u("sp") * 10 - 5)).cast("int")
        ).alias("speed"),
        (u("br") < 0.1).alias("brakes_on"),
        (u("sg") < 0.5).alias("signal_on"),
        (u("ln") < 0.02).alias("lane_departed"),
        (u("cl") < 0.001).alias("collision_detected"),
        (u("hz") < 0.001).alias("hazard_detected"),
        (25 + u("la") * 24).alias("latitude"),
        (-124 + u("lo") * 57).alias("longitude"),
    )
