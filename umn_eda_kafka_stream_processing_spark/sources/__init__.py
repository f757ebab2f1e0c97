from umn_eda_kafka_stream_processing_spark.sources.memory import rows_df
from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table, load_tables, register_views

__all__ = ["rows_df", "load_table", "load_tables", "register_views"]
