"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference Kafka Streams workshop app
(toddloken/umn_eda_kafka_stream_processing, surveyed in SURVEY.md).

Architecture: DataFrame/SQL-first (Catalyst plans the physical
execution), Structured Streaming for the streaming execution mode,
Pandas UDFs only where built-in operators cannot express the
semantics (custom stateful operators, multimodal decode).

Layout:
  session    — SparkSession factory with scale-aware defaults
  schemas    — StructTypes for the 9 reference entities (+ envelope)
  sources/   — parquet / in-memory / Kafka readers & writers
  operators/ — reusable relational + stateful operator library
  functions/ — scalar function library (string/date/hash helpers)
  pipelines/ — the 11 reference topologies re-expressed Spark-first
  streaming/ — Structured Streaming runners & stateful ops
  plans/     — plan inspection / optimization helpers
"""

from umn_eda_kafka_stream_processing_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
