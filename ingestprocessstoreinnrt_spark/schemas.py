"""Schema registry — one StructType per table, the single source of truth
(replaces the reference's triple declaration POJO + Kudu DDL + Solr
schema.xml, SURVEY 1.3; they drifted — e.g. `total_create_card_extra` in
create_ny_taxi_yellow_entity_table.impala:8).

Timestamps are stored as epoch-millis LongType to match the reference's
table contracts (NyTaxiYellowTrip.scala:8-9); TimestampType views are
derived where event-time ops need them.
"""

from __future__ import annotations

from pyspark.sql import types as T

# 2009-vintage raw CSV (FIXTURES.md §1) — all strings at ingest
TAXI_TRIP_RAW_COLUMNS = [
    "vendor_name",
    "Trip_Pickup_DateTime",
    "Trip_Dropoff_DateTime",
    "Passenger_Count",
    "Trip_Distance",
    "Start_Lon",
    "Start_Lat",
    "Rate_Code",
    "store_and_forward",
    "End_Lon",
    "End_Lat",
    "Payment_Type",
    "Fare_Amt",
    "surcharge",
    "mta_tax",
    "Tip_Amt",
    "Tolls_Amt",
    "Total_Amt",
]

# canonical cleaned/typed trip table (FIXTURES.md §2; Kudu DDL
# create_ny_taxi_yellow_trip_table.impala:1-28, PK (vender_id,
# tpep_pickup_datetime))
TAXI_TRIP = T.StructType(
    [
        T.StructField("vender_id", T.StringType()),
        T.StructField("tpep_pickup_datetime", T.LongType()),
        T.StructField("tpep_dropoff_datetime", T.LongType()),
        T.StructField("passenger_count", T.IntegerType()),
        T.StructField("trip_distance", T.DoubleType()),
        T.StructField("pickup_longitude", T.DoubleType()),
        T.StructField("pickup_latitude", T.DoubleType()),
        T.StructField("rate_code_id", T.StringType()),
        T.StructField("store_and_fwd_flag", T.StringType()),
        T.StructField("dropoff_longitude", T.DoubleType()),
        T.StructField("dropoff_latitude", T.DoubleType()),
        T.StructField("payment_type", T.StringType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("extra", T.DoubleType()),
        T.StructField("mta_tax", T.DoubleType()),
        T.StructField("improvement_surcharge", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
        T.StructField("tolls_amount", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
    ]
)

# per-vendor entity (create_ny_taxi_yellow_entity_table.impala:1-34, PK
# vender_id) — intended column names (impala's total_create_card_extra
# typo not replicated)
_MEASURES = (
    "fare_amount",
    "extra",
    "mta_tax",
    "impr_surcharge",
    "tip_amount",
    "tolls_amount",
    "total_amount",
)
TAXI_ENTITY = T.StructType(
    [T.StructField("vender_id", T.StringType())]
    + [
        T.StructField("total_trips", T.LongType()),
        T.StructField("total_passengers", T.LongType()),
        T.StructField("total_distance_of_trips", T.DoubleType()),
        T.StructField("max_distance_of_trip", T.DoubleType()),
    ]
    + [
        T.StructField(f"total_credit_card_{m}", T.DoubleType())
        for m in _MEASURES
    ]
    + [T.StructField(f"total_cash_{m}", T.DoubleType()) for m in _MEASURES]
    + [
        T.StructField(f"total_{k}_trips", T.LongType())
        for k in (
            "credit_card",
            "cash",
            "no_charge",
            "dispute",
            "unknown",
            "voided",
        )
    ]
)

# connected-car telemetry reading (ConnectedCarReading.scala:3-18;
# Kudu DDL CreateConnectedCarReadingsTable.scala:30-42, PK (time, vin);
# speed widened from the DDL's INT8, which overflows >127 mph — SURVEY 8.12)
CAR_READING = T.StructType(
    [
        T.StructField("time", T.LongType()),
        T.StructField("vin", T.StringType()),
        T.StructField("miles", T.LongType()),
        T.StructField("x_accel", T.DoubleType()),
        T.StructField("y_accel", T.DoubleType()),
        T.StructField("z_accel", T.DoubleType()),
        T.StructField("speed", T.IntegerType()),
        T.StructField("brakes_on", T.BooleanType()),
        T.StructField("signal_on", T.BooleanType()),
        T.StructField("lane_departed", T.BooleanType()),
        T.StructField("collision_detected", T.BooleanType()),
        T.StructField("hazard_detected", T.BooleanType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)

# per-VIN driver profile (CreateConnectedCarProfileTable.scala:34-51, PK vin)
CAR_PROFILE = T.StructType(
    [
        T.StructField("vin", T.StringType()),
        T.StructField("acceleration_aggression_score", T.DoubleType()),
        T.StructField("braking_aggression_score", T.DoubleType()),
        T.StructField("handling_aggression_score", T.DoubleType()),
        T.StructField("overall_aggression_score", T.DoubleType()),
        T.StructField("average_speed", T.IntegerType()),
        T.StructField("illegal_lane_departure_plus_minus", T.IntegerType()),
        T.StructField("collisions_count", T.LongType()),
        T.StructField("hazards_detected_count", T.LongType()),
        T.StructField("readings_count", T.LongType()),
        T.StructField("accelerating_readings_count", T.LongType()),
        T.StructField("decelerating_readings_count", T.LongType()),
        T.StructField("oil_replacement_period", T.IntegerType()),
        T.StructField("brake_replacement_period", T.IntegerType()),
        T.StructField("tire_replacement_period", T.IntegerType()),
        T.StructField("miles_count", T.LongType()),
        T.StructField("brakes_applied_count", T.LongType()),
        T.StructField("last_updated", T.LongType()),
    ]
)

# FHWA basic safety message (P1.scala:3-24; cell 0 of the CSV is unused)
BSM_P1 = T.StructType(
    [
        T.StructField("rx_device", T.LongType()),
        T.StructField("file_id", T.LongType()),
        T.StructField("tx_device", T.LongType()),
        T.StructField("gen_time", T.LongType()),
        T.StructField("day_of_week", T.StringType()),
        T.StructField("hour_of_day", T.IntegerType()),
        T.StructField("tx_random", T.LongType()),
        T.StructField("msg_count", T.LongType()),
        T.StructField("d_second", T.IntegerType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("elevation", T.DoubleType()),
        T.StructField("heading", T.DoubleType()),
        T.StructField("a_x", T.DoubleType()),
        T.StructField("a_y", T.DoubleType()),
        T.StructField("a_z", T.DoubleType()),
        T.StructField("path_count", T.IntegerType()),
        T.StructField("radius_of_curve", T.DoubleType()),
        T.StructField("confidence", T.IntegerType()),
    ]
)

# FHWA trip summary (TripSummary.scala:3-19)
TRIP_SUMMARY = T.StructType(
    [
        T.StructField("device_id", T.LongType()),
        T.StructField("trip_id", T.StringType()),
        T.StructField("epoch_start_time", T.LongType()),
        T.StructField("start_date", T.StringType()),
        T.StructField("start_time", T.StringType()),
        T.StructField("epoch_end_time", T.LongType()),
        T.StructField("end_date", T.StringType()),
        T.StructField("end_time", T.StringType()),
        T.StructField("total_trip_distance", T.DoubleType()),
        T.StructField("dis_travelled_plus_25_mph", T.DoubleType()),
        T.StructField("trip_duration", T.DoubleType()),
        T.StructField("avg_speed", T.DoubleType()),
        T.StructField("max_speed", T.DoubleType()),
        T.StructField("break_count", T.IntegerType()),
        T.StructField("wiper_activity", T.StringType()),
    ]
)
