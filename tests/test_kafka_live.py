"""OPT-IN live Kafka integration test.

The engine's Kafka boundary (sources/kafka.py) is the one SURVEY §2
surface that cannot execute end-to-end in this sandbox: there is no
broker, and the spark-sql-kafka connector jar is not on the
classpath. The codec layer (decode_json_topic / encode_json_topic —
the exact wire frame the connector produces/consumes) IS unit-tested
in test_kafka_codec.py; this module makes the remaining honesty note
FALSIFIABLE the moment a broker exists:

    KAFKA_BOOTSTRAP=host:9092 \
    PYSPARK_SUBMIT_ARGS="--packages org.apache.spark:\
spark-sql-kafka-0-10_2.13:<spark-version> pyspark-shell" \
    python -m pytest tests/test_kafka_live.py -q

Unset (the default here), every test skips cleanly. Set, the tests
drive the REAL batch write → batch read and readStream → transform →
writeStream → read-back paths against the broker, with a unique topic
per run (relies on the broker's default auto.create.topics.enable).
"""

from __future__ import annotations

import os
import uuid

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="KAFKA_BOOTSTRAP not set — no live broker in this environment; "
    "the Kafka wire codec is covered by tests/test_kafka_codec.py",
)

SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("amount", T.LongType()),
        T.StructField("event_seq", T.LongType()),
    ]
)


def _require_connector(exc: Exception) -> None:
    if "Failed to find data source: kafka" in str(exc):
        pytest.fail(
            "KAFKA_BOOTSTRAP is set but the spark-sql-kafka connector is "
            "not on the classpath. Launch pytest with PYSPARK_SUBMIT_ARGS="
            '"--packages org.apache.spark:spark-sql-kafka-0-10_2.13:'
            '<spark-version> pyspark-shell".'
        )
    raise exc


def test_kafka_batch_write_then_read_round_trip(spark):
    from umn_eda_kafka_stream_processing_spark.sources.kafka import read_topic, write_topic

    topic = f"sg-live-{uuid.uuid4().hex[:12]}"
    df = spark.createDataFrame(
        [("u1", 1, 10), ("u2", 2, 20), ("u1", 1, 30)],
        "key string, user_id long, amount long",
    )
    try:
        write_topic(df, topic, BOOTSTRAP)
    except Exception as e:  # noqa: BLE001 — classify, then re-raise
        _require_connector(e)
    got = read_topic(spark, topic, SCHEMA, BOOTSTRAP)
    rows = {(r["key"], r["user_id"], r["amount"]) for r in got.collect()}
    assert rows == {("u1", 1, 10), ("u2", 2, 20), ("u1", 1, 30)}
    # event_seq derives from the Kafka offset: unique per partition
    seqs = [r["event_seq"] for r in got.collect()]
    assert len(seqs) == 3


def test_kafka_stream_transform_write_stream_round_trip(spark, tmp_path):
    """readStream(topic A) → keyed latest-by-key transform →
    writeStream(topic B) → batch read-back of B: the reference's
    stream→KTable→to(topic) topology over the real substrate."""
    from umn_eda_kafka_stream_processing_spark.sources.kafka import (
        read_topic,
        stream_topic,
        write_stream_topic,
        write_topic,
    )
    from umn_eda_kafka_stream_processing_spark.streaming.stateful import (
        latest_by_key_stream,
    )

    src = f"sg-live-src-{uuid.uuid4().hex[:12]}"
    dst = f"sg-live-dst-{uuid.uuid4().hex[:12]}"
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("amount", T.LongType()),
            T.StructField("event_seq", T.LongType()),
        ]
    )
    try:
        write_topic(
            spark.createDataFrame(
                [("u1", 1, 10), ("u1", 1, 40), ("u2", 2, 20)],
                "key string, user_id long, amount long",
            ),
            src,
            BOOTSTRAP,
        )
    except Exception as e:  # noqa: BLE001
        _require_connector(e)
    stream = stream_topic(spark, src, SCHEMA, BOOTSTRAP)
    latest = latest_by_key_stream(stream, "key")
    q = write_stream_topic(
        latest, dst, BOOTSTRAP, checkpoint_location=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = read_topic(spark, dst, out_schema, BOOTSTRAP)
    # update-mode emits per record; the LAST emission per key carries
    # the winning (max event_seq) value — read back and take latest
    final = {}
    for r in sorted(got.collect(), key=lambda r: r["event_seq"]):
        final[r["key"]] = r["amount"]
    assert final == {"u1": 40, "u2": 20}
