"""CSV ingestion with the reference's cleaning rules, as one declarative
plan (no per-record closures, no POJOs):

  P3  header/blank skip        CsvKafkaPublisher.scala:66
      (startsWith("vendor_name") or length < 10)
  P1  split-projection         NyTaxiYellowTripStreaming.scala:116-118
  P2  malformed-row filter     (cells.size > 3)  :118
  P4  empty->'0' defaulting    NyTaxiYellowTrip.scala:78-84
  F2  uppercase payment type   NyTaxiYellowTrip.scala:67
  F4  timestamp parse          NyTaxiYellowTrip.scala:55-58 (intended
      24-hour HH — the reference's 12-hour `hh` is a bug, SURVEY 8.3)
  J2  payment-type normalization to numeric codes (SURVEY 7.3.4): the
      2015-era conditional aggregates expect codes '1'-'6' but 2009 data
      carries strings, which zeroed every code-gated sum (SURVEY 8.4).

The same function serves batch (`spark.read.text`) and streaming
(`spark.readStream.text`) — it's a pure DataFrame->DataFrame transform.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import parse_ts_millis, safe_num
from ..schemas import TAXI_TRIP_RAW_COLUMNS

# string payment spellings observed in the 2009 fixtures -> numeric codes
# (dimension from SURVEY 7.3.4; numeric map NyTaxiYellowTripStreaming.scala:24-29)
PAYMENT_CODE = {
    "CREDIT": "1",
    "CRD": "1",
    "CASH": "2",
    "CSH": "2",
    "NO CHARGE": "3",
    "NOC": "3",
    "DISPUTE": "4",
    "DIS": "4",
}
PAYMENT_NAME = {
    "1": "Credit card",
    "2": "Cash",
    "3": "No charge",
    "4": "Dispute",
    "5": "Unknown",
    "6": "Voided trip",
}


# shared cleaning-rule constants (single source of truth for both the
# reference-parity drop filter and the DLQ classifier)
HEADER_PREFIX = "vendor_name"  # CsvKafkaPublisher.scala:66
MIN_LINE_LEN = 10  # CsvKafkaPublisher.scala:66
MIN_CELLS = 4  # cells.size > 3, NyTaxiYellowTripStreaming.scala:118


def clean_raw_lines(lines: DataFrame, header_prefix: str = HEADER_PREFIX) -> DataFrame:
    """P3 + P1 + P2 over a single-column DataFrame of raw CSV lines
    (column name `value`, as produced by text/Kafka sources)."""
    return (
        lines.filter(~F.col("value").startswith(header_prefix))
        .filter(F.length("value") >= MIN_LINE_LEN)
        .withColumn("cells", F.split("value", ","))
        .filter(F.size("cells") >= MIN_CELLS)
    )


def _cell(i: int) -> Column:
    # F.get, not getItem: under ANSI mode an out-of-bounds index THROWS,
    # so a 4-17-cell line (legal per the reference's >3-cell rule) would
    # kill the job at cells[17]; get() yields null, which safe_num
    # then defaults — matching the reference's empty->'0' behavior
    return F.get(F.col("cells"), i)


def taxi_trips_from_lines(lines: DataFrame) -> DataFrame:
    """Raw 2009-vintage CSV lines -> canonical typed taxi_trip DataFrame
    (schemas.TAXI_TRIP).  2009->canonical column mapping per FIXTURES.md
    §1/§2; improvement_surcharge does not exist in 2009 data -> 0.0."""
    idx = {name: i for i, name in enumerate(TAXI_TRIP_RAW_COLUMNS)}
    c = lambda name: _cell(idx[name])  # noqa: E731

    def num(name: str) -> Column:
        return safe_num(c(name), "double")

    payment_raw = F.upper(F.trim(c("Payment_Type")))
    code_map = F.create_map(
        *[F.lit(x) for kv in PAYMENT_CODE.items() for x in kv]
    )
    payment_code = F.coalesce(
        # already-numeric 2015-style codes pass through
        F.when(payment_raw.isin(*PAYMENT_NAME.keys()), payment_raw),
        F.element_at(code_map, payment_raw),
        F.lit("5"),  # Unknown
    )

    return clean_raw_lines(lines).select(
        F.trim(c("vendor_name")).alias("vender_id"),
        parse_ts_millis(c("Trip_Pickup_DateTime")).alias("tpep_pickup_datetime"),
        parse_ts_millis(c("Trip_Dropoff_DateTime")).alias("tpep_dropoff_datetime"),
        safe_num(c("Passenger_Count"), "int").alias("passenger_count"),
        num("Trip_Distance").alias("trip_distance"),
        num("Start_Lon").alias("pickup_longitude"),
        num("Start_Lat").alias("pickup_latitude"),
        F.trim(c("Rate_Code")).alias("rate_code_id"),
        F.trim(c("store_and_forward")).alias("store_and_fwd_flag"),
        num("End_Lon").alias("dropoff_longitude"),
        num("End_Lat").alias("dropoff_latitude"),
        payment_code.alias("payment_type"),
        num("Fare_Amt").alias("fare_amount"),
        num("surcharge").alias("extra"),
        num("mta_tax").alias("mta_tax"),
        F.lit(0.0).alias("improvement_surcharge"),
        num("Tip_Amt").alias("tip_amount"),
        num("Tolls_Amt").alias("tolls_amount"),
        num("Total_Amt").alias("total_amount"),
    )


def read_taxi_trips(spark, path: str) -> DataFrame:
    """Batch entry: directory/file of raw CSV -> typed trips."""
    return taxi_trips_from_lines(spark.read.text(path))


def read_taxi_trips_stream(spark, path: str) -> DataFrame:
    """Streaming entry: same plan over a file-source stream."""
    return taxi_trips_from_lines(
        spark.readStream.format("text").load(path)
    )


# --- connected-car telemetry (14-field CSV, ConnectedCarReading.scala:3-18)


def car_readings_from_lines(lines: DataFrame) -> DataFrame:
    """Raw telemetry CSV lines -> typed car_reading DataFrame
    (schemas.CAR_READING).  Booleans parsed as equals("true")
    (ConnectedCarReading.scala:50-55); shares the line-cleaning
    constants with the taxi path."""
    cells = F.split("value", ",")
    c = lambda i: cells.getItem(i)  # noqa: E731
    return (
        lines.filter(F.length("value") >= MIN_LINE_LEN)
        .filter(F.size(cells) >= 14)
        .select(
            safe_num(c(0), "long").alias("time"),
            F.trim(c(1)).alias("vin"),
            safe_num(c(2), "long").alias("miles"),
            safe_num(c(3), "double").alias("x_accel"),
            safe_num(c(4), "double").alias("y_accel"),
            safe_num(c(5), "double").alias("z_accel"),
            safe_num(c(6), "int").alias("speed"),
            (c(7) == "true").alias("brakes_on"),
            (c(8) == "true").alias("signal_on"),
            (c(9) == "true").alias("lane_departed"),
            (c(10) == "true").alias("collision_detected"),
            (c(11) == "true").alias("hazard_detected"),
            safe_num(c(12), "double").alias("latitude"),
            safe_num(c(13), "double").alias("longitude"),
        )
    )


def read_car_readings(spark, path: str) -> DataFrame:
    return car_readings_from_lines(spark.read.text(path))


def read_car_readings_stream(spark, path: str) -> DataFrame:
    return car_readings_from_lines(spark.readStream.format("text").load(path))


# --- reject routing (dead-letter queue) -------------------------------------
#
# The reference silently swallows bad rows and sink errors
# (NyTaxiYellowTripStreaming.scala:298-313 — SURVEY 8.10).  A pipeline at
# scale needs the rejects observable: split the raw lines into (clean,
# rejects-with-reason) so the DLQ can be appended to its own table.


def split_taxi_rejects(lines: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(typed trips, rejected raw lines with a `reject_reason` column).
    Blank/whitespace lines are noise, not rejects; the header is dropped
    silently too (it's structural, not data).

    Stricter than the reference-parity drop filter (clean_raw_lines,
    same shared constants): a line that clears the reference's >3-cell
    rule but cannot fill the 18-column 2009 schema would otherwise
    become an all-null "clean" trip — here it routes to the DLQ as
    `too_few_columns_for_schema`."""
    n_schema_cells = len(TAXI_TRIP_RAW_COLUMNS)
    n_cells = F.size(F.split("value", ","))
    classified = (
        lines.filter(F.trim("value") != "")
        .filter(~F.col("value").startswith(HEADER_PREFIX))
        .withColumn(
            "reject_reason",
            F.when(F.length("value") < MIN_LINE_LEN, "line_too_short")
            .when(n_cells < MIN_CELLS, "too_few_cells")
            .when(n_cells < n_schema_cells, "too_few_columns_for_schema")
            .otherwise(F.lit(None)),
        )
    )
    good = taxi_trips_from_lines(
        classified.filter(F.col("reject_reason").isNull()).select("value")
    )
    rejects = classified.filter(F.col("reject_reason").isNotNull()).select(
        "value", "reject_reason"
    )
    return good, rejects
