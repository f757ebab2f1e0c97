from umn_eda_kafka_stream_processing_spark.plans.catalog import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
