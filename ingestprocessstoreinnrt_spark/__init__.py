"""PySpark-native analytics engine with the query and data-processing
capabilities of the "ingest -> process -> store in NRT" pattern
(reference: tmalaska/IngestProcessStoreInNRT), rebuilt Spark-first.

Layout:
  session.py    SparkSession factory (local test defaults, cluster-safe knobs)
  catalog.py    table registry over the driver's parquet testdata
  schemas.py    single-source-of-truth StructTypes (replaces the reference's
                triple POJO/Kudu-DDL/Solr-schema declaration, SURVEY 1.3)
  functions/    scalar/text/vector column helpers (reference F1-F20)
  operators/    batch query layer: BI, entity/profile aggs, dedup,
                similarity, text analysis, ML
  sources/      CSV cleaning reader, deterministic fixture generators,
                stream readers
  streaming/    structured-streaming pipelines, keyed upsert sink, stateful
                profile op with initial-state bootstrap
"""

__version__ = "0.1.0"
