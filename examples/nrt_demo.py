"""End-to-end NRT demo — the reference's full taxi workflow
(NyTaxiYellowTripStreaming) on this engine, in one script:

  raw dirty 2009 CSV  (the CsvKafkaPublisher replay role)
    -> streaming clean/parse            (P1-P4, F2-F4, payment dim)
    -> trip fact table, append          (K1; partitioned parquet)
    -> per-vendor entity, exact upsert  (A1/K2; bucketed keyed table)
    -> search index documents           (K3; composite ids, ISO times)
    -> analyst SQL on the live tables   (the four Impala BI queries)

Run:  python examples/nrt_demo.py  [rows]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ingestprocessstoreinnrt_spark.operators import index, taxi
from ingestprocessstoreinnrt_spark.session import get_spark
from ingestprocessstoreinnrt_spark.sources import csv_clean, generators
from ingestprocessstoreinnrt_spark.streaming import pipelines
from ingestprocessstoreinnrt_spark.streaming.upsert import UpsertTable


def main(rows: int = 5000) -> None:
    spark = get_spark("nrt-demo")
    work = tempfile.mkdtemp(prefix="nrt_demo_")
    print(f"workdir: {work}")

    # 1. "Kafka topic": dirty CSV landed in chunks (header, blank lines,
    #    empty cells, mixed-case payment strings)
    raw = generators.write_taxi_csv(f"{work}/raw/batch0.csv", rows=rows)
    print(f"generated {rows} dirty CSV rows -> {raw}")

    # 2. streaming graph: clean/parse once, fan out to three sinks
    trips_stream = csv_clean.read_taxi_trips_stream(spark, f"{work}/raw")

    q1 = pipelines.append_stream(
        trips_stream, f"{work}/trip_facts", f"{work}/ckpt_facts"
    )
    entity_table = UpsertTable(
        spark, f"{work}/entity", ["vender_id"], num_buckets=4
    )
    q2 = pipelines.upsert_aggregate_stream(
        csv_clean.read_taxi_trips_stream(spark, f"{work}/raw"),
        entity_table,
        taxi.entity_from_trips,
        lambda c, n: taxi.merge_taxi_entities(c, n),
        f"{work}/ckpt_entity",
    )
    index_table = UpsertTable(spark, f"{work}/index", ["doc_id"], num_buckets=4)
    q3 = pipelines.upsert_aggregate_stream(
        csv_clean.read_taxi_trips_stream(spark, f"{work}/raw"),
        index_table,
        index.taxi_trip_documents,
        None,  # plain last-write-wins document upsert
        f"{work}/ckpt_index",
    )
    for q in (q1, q2, q3):
        q.awaitTermination(300)

    # 3. analyst SQL over the stream-maintained tables
    trips = spark.read.parquet(f"{work}/trip_facts")
    trips.createOrReplaceTempView("ny_taxi_trips")
    entity_table.read().createOrReplaceTempView("ny_taxi_entity")
    index_table.read().createOrReplaceTempView("ny_taxi_index")

    print("\n== entity table (A1 running aggregates, via exact upsert) ==")
    spark.sql(
        """SELECT vender_id, total_trips, total_passengers,
                  round(total_distance_of_trips, 2) AS total_distance,
                  total_cash_trips, total_credit_card_trips
           FROM ny_taxi_entity ORDER BY total_trips DESC"""
    ).show()

    print("== bi_payment_type_roll_up (A4) ==")
    taxi.payment_type_rollup(trips).select(
        "payment_type", "vender_id", "trip_count", "sum_total_amount"
    ).orderBy("payment_type", "vender_id").show(8)

    print("== bi_top_ten_venders (A5) ==")
    taxi.top_ten_vendors(trips).show()

    print("== bi_trip_per_time_of_day (A6, Wednesdays) ==")
    taxi.trip_per_time_of_day(trips, 4).orderBy("hour_of_day").show(6)

    print("== point lookup + search index (P6 / K3) ==")
    spark.sql(
        "SELECT doc_id, pickup_iso, payment_name, total_amount "
        "FROM ny_taxi_index WHERE vender_id = 'DDS' LIMIT 5"
    ).show(truncate=False)

    n_facts = trips.count()
    n_entities = entity_table.read().count()
    n_docs = index_table.read().count()
    print(f"facts={n_facts} entities={n_entities} index_docs={n_docs}")
    assert n_facts == rows and n_docs == rows
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
