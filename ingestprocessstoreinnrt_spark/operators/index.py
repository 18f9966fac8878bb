"""Search/serving index — the SolrCloud role (K3): a denormalized,
query-optimized document table maintained next to the fact table
(document construction NyTaxiYellowTripStreaming.scala:184-211; schema
solr/ny_taxi/schema.xml:33-50; car event docs
ConnectedCarStreaming.scala:152-176).

Spark-first: the "index" is an UpsertTable keyed by document id and
bucketed for point lookups; batching/retry concerns of SolrSupport.java:
49-126 are subsumed by the sink's idempotent MERGE + task retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import composite_id, dict_lookup, millis_to_iso8601
from ..sources.csv_clean import PAYMENT_NAME

RATE_CODE_NAME = {
    "1": "Standard rate",
    "2": "JFK",
    "3": "Newark",
    "4": "Nassau or Westchester",
    "5": "Negotiated fare",
    "6": "Group ride",
}


def taxi_trip_documents(trips: DataFrame) -> DataFrame:
    """Trip -> search document: composite id (vendor + pickup time,
    NyTaxiYellowTripStreaming.scala:192), ISO-8601 event times (F5), and
    human-readable payment/rate names (J2 dictionary enrichment)."""
    return trips.select(
        composite_id("vender_id", "tpep_pickup_datetime").alias("doc_id"),
        F.col("vender_id"),
        millis_to_iso8601("tpep_pickup_datetime").alias("pickup_iso"),
        millis_to_iso8601("tpep_dropoff_datetime").alias("dropoff_iso"),
        "passenger_count",
        "trip_distance",
        dict_lookup("payment_type", PAYMENT_NAME, "Unknown").alias(
            "payment_name"
        ),
        dict_lookup("rate_code_id", RATE_CODE_NAME, "Unknown").alias(
            "rate_code_name"
        ),
        "fare_amount",
        "tip_amount",
        "total_amount",
        "pickup_longitude",
        "pickup_latitude",
    )


def car_event_documents(readings: DataFrame) -> DataFrame:
    """Filtered car events -> documents (the commented-out car->Solr
    branch, ConnectedCarStreaming.scala:145-192): composite id vin+time,
    event class from the P5 predicate."""
    from .car import event_filter

    ev = event_filter(readings)
    return ev.select(
        composite_id("vin", "time").alias("doc_id"),
        "vin",
        millis_to_iso8601("time").alias("event_iso"),
        F.when(F.col("collision_detected"), "collision")
        .when(F.col("hazard_detected"), "hazard")
        .otherwise("illegal_lane_departure")
        .alias("event_class"),
        "speed",
        "latitude",
        "longitude",
    )
