"""Tests for skew-mitigation operators and peek/observe."""

from __future__ import annotations

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.core import grouped_count, peek
from umn_eda_kafka_stream_processing_spark.operators.skew import salted_agg, salted_grouped_count


def test_salted_count_matches_plain_count(spark):
    df = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(7)],
        "k string, v long",
    )
    plain = {(r["k"], r["count"]) for r in grouped_count(df, "k").collect()}
    salted = {(r["k"], r["count"])
              for r in salted_grouped_count(df, "k", salt_buckets=8).collect()}
    salted_det = {(r["k"], r["count"])
                  for r in salted_grouped_count(df, "k", salt_cols=["v"]).collect()}
    assert salted == plain == salted_det == {("hot", 500), ("cold", 7)}


def test_salted_agg_distributive(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 10.0)], "k string, v double"
    )
    got = {
        (r["k"], r["s"], r["mx"])
        for r in salted_agg(
            df, "k",
            partial_aggs=[F.sum("v").alias("s"), F.max("v").alias("mx")],
            final_aggs=[F.sum("s").alias("s"), F.max("mx").alias("mx")],
            salt_cols=["v"],
        ).collect()
    }
    assert got == {("a", 6.0, 3.0), ("b", 10.0, 10.0)}


def test_peek_is_passthrough(spark):
    df = spark.createDataFrame([(1,), (2,)], "x long")
    observed = peek(df, F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
    assert sorted(r["x"] for r in observed.collect()) == [1, 2]


def test_topk_as_ordered_map(spark):
    from umn_eda_kafka_stream_processing_spark.operators.core import grouped_topk, topk_as_ordered_map

    df = spark.createDataFrame(
        [("c1", "a1", 5), ("c1", "a2", 9), ("c1", "a3", 1), ("c2", "a1", 2)],
        "customerid string, artistid string, count long",
    )
    topk = grouped_topk(
        df, ["customerid"], [F.col("count").desc(), F.col("artistid").asc()], 2
    )
    got = {r["customerid"]: [(s["name"], s["count"]) for s in r["top"]]
           for r in topk_as_ordered_map(topk, "customerid", "artistid").collect()}
    assert got == {"c1": [("a2", 9), ("a1", 5)], "c2": [("a1", 2)]}
