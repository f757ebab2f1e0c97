import umn_eda_kafka_stream_processing_spark.plans.catalog  # noqa: F401  (registers star-schema queries)
import umn_eda_kafka_stream_processing_spark.plans.catalog_data  # noqa: F401  (registers data-pipeline queries)
import umn_eda_kafka_stream_processing_spark.plans.catalog_scenarios  # noqa: F401  (registers scenario-catalog queries)
import umn_eda_kafka_stream_processing_spark.plans.catalog_windows  # noqa: F401  (registers temporal-operator queries)
import umn_eda_kafka_stream_processing_spark.plans.catalog_analytics  # noqa: F401  (registers analytics-surface queries)
import umn_eda_kafka_stream_processing_spark.plans.catalog_sampling  # noqa: F401  (registers deterministic-sampling queries)
import umn_eda_kafka_stream_processing_spark.plans.catalog_packing  # noqa: F401  (registers sequence-packing queries)
import umn_eda_kafka_stream_processing_spark.plans.catalog_sketches  # noqa: F401  (registers sketch queries)
import umn_eda_kafka_stream_processing_spark.plans.catalog_tpch  # noqa: F401  (registers TPC-H completion queries)
from umn_eda_kafka_stream_processing_spark.plans.registry import REGISTRY, QuerySpec
from umn_eda_kafka_stream_processing_spark.plans.priority import (
    DRIVER_GATE_PRIORITY,
    DRIVER_GATE_SLOTS,
    ordered_registry,
)

__all__ = [
    "REGISTRY",
    "QuerySpec",
    "DRIVER_GATE_PRIORITY",
    "DRIVER_GATE_SLOTS",
    "ordered_registry",
]
