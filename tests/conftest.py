from __future__ import annotations

import pytest

from umn_eda_kafka_stream_processing_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="umn_eda_kafka_stream_processing_spark-tests",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    yield spark
