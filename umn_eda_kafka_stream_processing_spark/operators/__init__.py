from umn_eda_kafka_stream_processing_spark.operators.core import (
    branch,
    grouped_count,
    grouped_topk,
    latest_by_key,
    merge,
    peek,
    rekey,
    running_count,
    topk_as_ordered_map,
)
from umn_eda_kafka_stream_processing_spark.operators.joins import asof_join, interval_join
from umn_eda_kafka_stream_processing_spark.operators.skew import salted_agg, salted_grouped_count, salted_join
from umn_eda_kafka_stream_processing_spark.operators.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
    with_watermark,
)

__all__ = [
    "asof_join",
    "branch",
    "grouped_count",
    "grouped_topk",
    "interval_join",
    "latest_by_key",
    "merge",
    "peek",
    "rekey",
    "running_count",
    "salted_agg",
    "salted_grouped_count",
    "salted_join",
    "session_agg",
    "sliding_agg",
    "topk_as_ordered_map",
    "tumbling_agg",
    "with_watermark",
]
