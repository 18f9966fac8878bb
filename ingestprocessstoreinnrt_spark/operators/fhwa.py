"""FHWA vertical: basic-safety-message (P1) and trip-summary parse +
enrich + append pipelines (p1Streaming.scala:30-89,
TripSummaryStreaming.scala:31-90 — note the reference jobs never start,
SURVEY 8.5; the intended pipeline is implemented).

Enrichments: derived acceleration magnitude a_a = sqrt(ax^2+ay^2+az^2)
(P1.scala:22-23, F12), day-of-week name (F6), hour-of-day (F7), ISO-8601
timestamps for the index documents (F5).  CSV cell 0 is unused by the
reference parser (P1.scala:30 starts at cells(1) — SURVEY 8.11, kept:
it's the actual input contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import (
    accel_magnitude,
    composite_id,
    dict_lookup,
    millis_to_iso8601,
    safe_num,
)

# Calendar.DAY_OF_WEEK int -> name (p1Streaming.scala:22-28)
DAY_NAMES = {
    1: "Sunday",
    2: "Monday",
    3: "Tuesday",
    4: "Wednesday",
    5: "Thursday",
    6: "Friday",
    7: "Saturday",
}

_P1_FIELDS = [
    ("rx_device", "long"),
    ("file_id", "long"),
    ("tx_device", "long"),
    ("gen_time", "long"),
    ("day_of_week", "string"),
    ("hour_of_day", "int"),
    ("tx_random", "long"),
    ("msg_count", "long"),
    ("d_second", "int"),
    ("latitude", "double"),
    ("longitude", "double"),
    ("elevation", "double"),
    ("heading", "double"),
    ("a_x", "double"),
    ("a_y", "double"),
    ("a_z", "double"),
    ("path_count", "int"),
    ("radius_of_curve", "double"),
    ("confidence", "int"),
]


def p1_from_lines(lines: DataFrame) -> DataFrame:
    cells = F.split("value", ",")
    cols = []
    for i, (name, typ) in enumerate(_P1_FIELDS, start=1):  # cell 0 skipped
        c = cells.getItem(i)
        if typ == "string":
            cols.append(F.trim(c).alias(name))
        else:
            cols.append(safe_num(c, typ).alias(name))
    return (
        lines.filter(F.length("value") >= 10)
        .filter(F.size(F.split("value", ",")) >= len(_P1_FIELDS) + 1)
        .select(*cols)
    )


def enrich_p1(p1: DataFrame) -> DataFrame:
    """Derived magnitude + recomputed time-of-day enrichments (the sink
    recomputes day/hour from gen_time rather than trusting the input
    columns — p1Streaming.scala:137-140)."""
    ts = F.timestamp_millis(F.col("gen_time"))
    return (
        p1.withColumn("a_a", accel_magnitude("a_x", "a_y", "a_z"))
        .withColumn("gen_day_of_week", dict_lookup(F.dayofweek(ts), DAY_NAMES, "?"))
        .withColumn("gen_hour_of_day", F.hour(ts))
    )


def p1_index_documents(p1: DataFrame) -> DataFrame:
    """Solr-analog documents (p1Streaming.scala:91-121): composite id +
    ISO timestamp + the enriched row."""
    enriched = enrich_p1(p1)
    return enriched.select(
        composite_id("rx_device", "file_id", "gen_time").alias("doc_id"),
        millis_to_iso8601("gen_time").alias("gen_time_iso"),
        "*",
    )


_TS_FIELDS = [
    ("device_id", "long"),
    ("trip_id", "string"),
    ("epoch_start_time", "long"),
    ("start_date", "string"),
    ("start_time", "string"),
    ("epoch_end_time", "long"),
    ("end_date", "string"),
    ("end_time", "string"),
    ("total_trip_distance", "double"),
    ("dis_travelled_plus_25_mph", "double"),
    ("trip_duration", "double"),
    ("avg_speed", "double"),
    ("max_speed", "double"),
    ("break_count", "int"),
    ("wiper_activity", "string"),
]


def trip_summary_from_lines(lines: DataFrame) -> DataFrame:
    cells = F.split("value", ",")
    cols = []
    for i, (name, typ) in enumerate(_TS_FIELDS):
        c = cells.getItem(i)
        if typ == "string":
            cols.append(F.trim(c).alias(name))
        else:
            cols.append(safe_num(c, typ).alias(name))
    return (
        lines.filter(F.length("value") >= 10)
        .filter(F.size(F.split("value", ",")) >= len(_TS_FIELDS))
        .select(*cols)
    )


def enrich_trip_summary(ts_df: DataFrame) -> DataFrame:
    """Start/end enrichment (TripSummaryStreaming.scala:91-114; the
    reference's epoch_end_time-from-start typo and `wider_activity`
    field name are recorded bugs, SURVEY 8.9 — intended columns here)."""
    start = F.timestamp_millis(F.col("epoch_start_time"))
    return (
        ts_df.withColumn("start_iso", millis_to_iso8601("epoch_start_time"))
        .withColumn("end_iso", millis_to_iso8601("epoch_end_time"))
        .withColumn(
            "start_day_of_week", dict_lookup(F.dayofweek(start), DAY_NAMES, "?")
        )
        .withColumn("start_hour_of_day", F.hour(start))
    )
