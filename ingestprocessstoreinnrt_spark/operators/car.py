"""Connected-car vertical: per-VIN driver profile (A3) with the exact
intended semantics of ConnectedCarProfile.addReading
(ConnectedCarProfile.scala:60-134):

  miles_count                   running MAX(miles)                 (:81-83)
  acceleration_aggression      mean(y_accel | y_accel > 0)         (:85-87)
  braking_aggression           mean(|y_accel| | y_accel <= 0)      (:88-90)
  handling_aggression          mean(|x_accel|)                     (:93)
  overall                      sum of the three scores             (:95)
  average_speed                truncated mean speed                (:98)
  illegal_lane_departure_+/-   +1 no-signal departure, -1 signaled (:100-106)
  collisions/hazards/brakes    counters                            (:108-118)
  maintenance periods          linear in scores, clamped           (:120-131)
      oil   = clamp(5000  - int((accel - 2)   * 5000),  500,  10000)
      brake = clamp(30000 - int((braking - 1) * 15000), 1000, 50000)
      tire  = clamp(30000 - int((handling-.5) * 25000), 1000, 50000)

The reference folds these per record with an order-dependent
integer-truncating combineAverages (:136-142); true weighted means are
implemented instead (the intended semantics — SURVEY 7.3.3), truncation
kept only at final projection.  `.toInt` truncates toward zero, so the
double->int steps use an explicit truncation expression (portable,
unlike CAST which rounds in some engines).

Dirty telemetry guard: rows with empty VIN or negative speed (the
generator's injected errors) are filtered ahead of aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import clamp


def _trunc_int(c: Column) -> Column:
    """Scala .toInt: truncate toward zero."""
    return F.when(c >= 0, F.floor(c)).otherwise(-F.floor(-c)).cast("int")


def clean_readings(readings: DataFrame) -> DataFrame:
    return readings.filter(
        (F.col("vin") != "") & F.col("vin").isNotNull() & (F.col("speed") >= 0)
    )


def profile_from_readings(readings: DataFrame) -> DataFrame:
    r = clean_readings(readings)
    prof = r.groupBy("vin").agg(
        F.max("miles").alias("miles_count"),
        F.avg(F.when(r.y_accel > 0, r.y_accel)).alias(
            "acceleration_aggression_score"
        ),
        F.avg(F.when(r.y_accel <= 0, F.abs(r.y_accel))).alias(
            "braking_aggression_score"
        ),
        F.avg(F.abs(r.x_accel)).alias("handling_aggression_score"),
        F.avg("speed").alias("_avg_speed_raw"),
        F.sum(
            F.when(r.lane_departed & ~r.signal_on, 1)
            .when(r.lane_departed & r.signal_on, -1)
            .otherwise(0)
        ).cast("int").alias("illegal_lane_departure_plus_minus"),
        F.sum(F.when(r.collision_detected, 1).otherwise(0))
        .cast("long").alias("collisions_count"),
        F.sum(F.when(r.hazard_detected, 1).otherwise(0))
        .cast("long").alias("hazards_detected_count"),
        F.sum(F.when(r.brakes_on, 1).otherwise(0))
        .cast("long").alias("brakes_applied_count"),
        F.count(F.lit(1)).alias("readings_count"),
        F.sum(F.when(r.y_accel > 0, 1).otherwise(0))
        .cast("long").alias("accelerating_readings_count"),
        F.sum(F.when(r.y_accel <= 0, 1).otherwise(0))
        .cast("long").alias("decelerating_readings_count"),
        F.max("time").alias("last_updated"),
    )
    prof = (
        prof.withColumn(
            "acceleration_aggression_score",
            F.coalesce("acceleration_aggression_score", F.lit(0.0)),
        )
        .withColumn(
            "braking_aggression_score",
            F.coalesce("braking_aggression_score", F.lit(0.0)),
        )
        .withColumn(
            "overall_aggression_score",
            F.col("acceleration_aggression_score")
            + F.col("braking_aggression_score")
            + F.col("handling_aggression_score"),
        )
        .withColumn("average_speed", _trunc_int(F.col("_avg_speed_raw")))
        .drop("_avg_speed_raw")
    )
    oil = clamp(
        F.lit(5000)
        - _trunc_int((F.col("acceleration_aggression_score") - 2) * 5000),
        500,
        10000,
    )
    brake = clamp(
        F.lit(30000)
        - _trunc_int((F.col("braking_aggression_score") - 1) * 15000),
        1000,
        50000,
    )
    tire = clamp(
        F.lit(30000)
        - _trunc_int((F.col("handling_aggression_score") - 0.5) * 25000),
        1000,
        50000,
    )
    return (
        prof.withColumn("oil_replacement_period", oil.cast("int"))
        .withColumn("brake_replacement_period", brake.cast("int"))
        .withColumn("tire_replacement_period", tire.cast("int"))
    )


# --- sufficient-statistics form (streaming/merge path) ---------------------
#
# State = exactly-mergeable sufficient statistics (quantized sums +
# counts + maxes); the profile is a derived VIEW of the stats.  This is
# the Spark-native replacement for the reference's order-dependent
# combineAverages fold: merge(stats(A), stats(B)) == stats(A ∪ B)
# bit-for-bit, so the streaming upsert equals the batch profile exactly.

from ..functions.scalars import quantize  # to 1e-4 integer units


def stats_from_readings(readings: DataFrame) -> DataFrame:
    r = clean_readings(readings)
    return r.groupBy("vin").agg(
        F.sum(F.coalesce(quantize(F.when(r.y_accel > 0, r.y_accel)), F.lit(0)))
        .cast("long").alias("acc_sum_q"),
        F.sum(F.when(r.y_accel > 0, 1).otherwise(0))
        .cast("long").alias("accelerating_readings_count"),
        F.sum(F.coalesce(quantize(F.when(r.y_accel <= 0, F.abs(r.y_accel))), F.lit(0)))
        .cast("long").alias("dec_sum_q"),
        F.sum(F.when(r.y_accel <= 0, 1).otherwise(0))
        .cast("long").alias("decelerating_readings_count"),
        F.sum(quantize(F.abs(r.x_accel))).cast("long").alias("hand_sum_q"),
        F.sum("speed").cast("long").alias("speed_sum"),
        F.sum(
            F.when(r.lane_departed & ~r.signal_on, 1)
            .when(r.lane_departed & r.signal_on, -1)
            .otherwise(0)
        ).cast("long").alias("illegal_lane_departure_plus_minus"),
        F.sum(F.when(r.collision_detected, 1).otherwise(0))
        .cast("long").alias("collisions_count"),
        F.sum(F.when(r.hazard_detected, 1).otherwise(0))
        .cast("long").alias("hazards_detected_count"),
        F.sum(F.when(r.brakes_on, 1).otherwise(0))
        .cast("long").alias("brakes_applied_count"),
        F.count(F.lit(1)).alias("readings_count"),
        F.max("miles").alias("miles_count"),
        F.max("time").alias("last_updated"),
    )


def merge_stats(*parts: DataFrame) -> DataFrame:
    from .merge import merge_keyed

    return merge_keyed(
        parts,
        key_cols=["vin"],
        count_cols=[
            "acc_sum_q",
            "accelerating_readings_count",
            "dec_sum_q",
            "decelerating_readings_count",
            "hand_sum_q",
            "speed_sum",
            "illegal_lane_departure_plus_minus",
            "collisions_count",
            "hazards_detected_count",
            "brakes_applied_count",
            "readings_count",
        ],
        max_cols=["miles_count", "last_updated"],
    )


def profile_from_stats(stats: DataFrame) -> DataFrame:
    """Derive the serving profile from sufficient statistics (same
    formulas/clamps as profile_from_readings; quantized-mean variant)."""

    def qmean(sum_q: str, n: str):
        return F.when(
            F.col(n) > 0,
            F.col(sum_q).cast("double") / F.lit(10000.0) / F.col(n),
        ).otherwise(F.lit(0.0))

    prof = (
        stats.withColumn(
            "acceleration_aggression_score",
            qmean("acc_sum_q", "accelerating_readings_count"),
        )
        .withColumn(
            "braking_aggression_score",
            qmean("dec_sum_q", "decelerating_readings_count"),
        )
        .withColumn(
            "handling_aggression_score", qmean("hand_sum_q", "readings_count")
        )
        .withColumn(
            "overall_aggression_score",
            F.col("acceleration_aggression_score")
            + F.col("braking_aggression_score")
            + F.col("handling_aggression_score"),
        )
        .withColumn(
            "average_speed",
            _trunc_int(
                F.col("speed_sum").cast("double") / F.col("readings_count")
            ),
        )
    )
    oil = clamp(
        F.lit(5000)
        - _trunc_int((F.col("acceleration_aggression_score") - 2) * 5000),
        500,
        10000,
    )
    brake = clamp(
        F.lit(30000)
        - _trunc_int((F.col("braking_aggression_score") - 1) * 15000),
        1000,
        50000,
    )
    tire = clamp(
        F.lit(30000)
        - _trunc_int((F.col("handling_aggression_score") - 0.5) * 25000),
        1000,
        50000,
    )
    return (
        prof.withColumn("oil_replacement_period", oil.cast("int"))
        .withColumn("brake_replacement_period", brake.cast("int"))
        .withColumn("tire_replacement_period", tire.cast("int"))
        .withColumn(
            "illegal_lane_departure_plus_minus",
            F.col("illegal_lane_departure_plus_minus").cast("int"),
        )
        .drop("acc_sum_q", "dec_sum_q", "hand_sum_q", "speed_sum")
    )


def event_filter(readings: DataFrame) -> DataFrame:
    """P5 — the boolean-predicate event filter feeding the search index
    (ConnectedCarStreaming.scala:148-151): collisions OR hazards OR
    unsignaled lane departures."""
    return readings.filter(
        F.col("collision_detected")
        | F.col("hazard_detected")
        | (F.col("lane_departed") & ~F.col("signal_on"))
    )
