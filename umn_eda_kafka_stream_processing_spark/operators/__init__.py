from umn_eda_kafka_stream_processing_spark.operators.core import (
    branch,
    grouped_count,
    grouped_topk,
    latest_by_key,
    merge,
    rekey,
    running_count,
)

__all__ = [
    "branch",
    "grouped_count",
    "grouped_topk",
    "latest_by_key",
    "merge",
    "rekey",
    "running_count",
]
