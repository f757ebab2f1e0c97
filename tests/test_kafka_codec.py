"""Kafka wire-format codec tests (sources/kafka.py) — the JSON
envelope round trip, without a broker: raw Kafka-shaped rows
(key/value binary + offset) ⇄ typed entity DataFrames."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark import schemas
from umn_eda_kafka_stream_processing_spark.sources.kafka import (
    decode_json_topic,
    encode_json_topic,
)


def _raw_kafka_df(spark, records):
    """records: (key, value_dict, offset) → Kafka source shape."""
    rows = [
        (k.encode(), json.dumps(v).encode(), "data-demo-x", 0, off)
        for k, v, off in records
    ]
    return spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long"
    )


def test_decode_json_topic_typed_fields_and_envelope(spark):
    raw = _raw_kafka_df(spark, [
        ("e1", {"id": "e1", "artistid": "a1", "venueid": "v1",
                "capacity": 250, "eventdate": "2024-05-01"}, 7),
        ("e2", {"id": "e2", "artistid": "a2", "venueid": "v1",
                "capacity": 50, "eventdate": "today"}, 8),
    ])
    got = {r["id"]: r for r in decode_json_topic(raw, schemas.EVENT).collect()}
    assert got["e1"]["capacity"] == 250          # typed int, not string
    assert got["e1"]["key"] == "e1"
    assert got["e1"]["event_seq"] == 7           # offset → arrival order
    assert got["e2"]["eventdate"] == "today"


def test_encode_decode_round_trip(spark):
    from tests import fixtures as fx
    df = fx.df(spark, "ticket", [fx.ticket("t1", "c1", "e1", price=12.5)])
    wire = encode_json_topic(df)
    assert wire.columns == ["key", "value"]
    (row,) = wire.collect()
    payload = json.loads(row["value"])
    assert payload["price"] == 12.5 and payload["customerid"] == "c1"
    # decode the wire rows back through the Kafka shape
    raw = spark.createDataFrame(
        [(row["key"].encode(), row["value"].encode(), "t", 0, 0)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    back = decode_json_topic(raw, schemas.TICKET).collect()[0]
    assert (back["id"], back["price"]) == ("t1", 12.5)


def test_decode_malformed_json_yields_nulls_not_failure(spark):
    raw = spark.createDataFrame(
        [(b"k", b"{not json", "t", 0, 0)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    rows = decode_json_topic(raw, schemas.TICKET).collect()
    assert len(rows) == 1 and rows[0]["id"] is None  # poison pill tolerated
