from umn_eda_kafka_stream_processing_spark.functions.scalar import (
    birth_decade_filter,
    composite_key,
    remaining_percentage,
    split_composite_key,
    stringify_address,
)

__all__ = [
    "birth_decade_filter",
    "composite_key",
    "remaining_percentage",
    "split_composite_key",
    "stringify_address",
]
