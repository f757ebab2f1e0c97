"""Bucketed co-located joins: the write-once/join-free-forever
shuffle trade (sources/bucketed.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.sources.bucketed import (
    bucketed,
    exchange_count,
    write_bucketed,
)
from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buck LOCATION '{wh}'")
    spark.sql("USE buck")
    try:
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        write_bucketed(
            orders.withColumnRenamed("o_orderkey", "orderkey"),
            "buck.orders_b", "orderkey", 8,
        )
        write_bucketed(
            lineitem.withColumnRenamed("l_orderkey", "orderkey"),
            "buck.lineitem_b", "orderkey", 8,
        )
        yield
    finally:
        spark.sql("USE default")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # hint the sort-merge strategy: at this toy scale Catalyst would
    # rather broadcast the small side (also shuffle-free, but not the
    # mechanism under test); at fact-fact scale SMJ is what it picks
    joined = bucketed(spark, "buck.orders_b").hint("merge").join(
        bucketed(spark, "buck.lineitem_b"), "orderkey", "inner"
    )
    # both sides pre-bucketed on the join key: zero Exchange operators
    assert exchange_count(joined) == 0
    # and the join is still correct
    plain = load_table(spark, SF_DIR, "orders").join(
        load_table(spark, SF_DIR, "lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert joined.count() == plain.count()


def test_plain_join_shuffles_for_contrast(spark, bucketed_tables):
    plain = load_table(spark, SF_DIR, "orders").hint("merge").join(
        load_table(spark, SF_DIR, "lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    assert exchange_count(plain) >= 2  # both sides shuffle on the key


def test_bucketed_aggregation_skips_exchange(spark, bucketed_tables):
    # groupBy on the bucket key reuses the bucket partitioning too
    agg = bucketed(spark, "buck.lineitem_b").groupBy("orderkey").count()
    assert exchange_count(agg) == 0
