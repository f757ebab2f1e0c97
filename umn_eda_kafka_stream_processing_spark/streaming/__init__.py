from umn_eda_kafka_stream_processing_spark.streaming.stateful import (
    event_status_stream,
    latest_by_key_stream,
    topk_counter_stream,
)

__all__ = [
    "event_status_stream",
    "latest_by_key_stream",
    "topk_counter_stream",
]
