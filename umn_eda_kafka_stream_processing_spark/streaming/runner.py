"""Streaming pipeline runner: source → transform → sink wiring.

The reference's runtime loop (reference: Streams.java:98-122 —
build topology, cleanUp(), start, shutdown hook) maps to Structured
Streaming queries: a source DataFrame, a logical-plan transform (the
same functions pipelines/reference.py applies in batch), and a
managed sink with checkpointing.

Sources: Kafka (sources/kafka.py:stream_topic) in production; a
file-directory source for tests and replay (each dropped file is a
microbatch — the TopologyTestDriver analogue: tests append a file,
process-all, assert).

Sinks: Kafka (sources/kafka.py:write_stream_topic), an in-memory
table (tests/inspection), or foreachBatch for side-effecting
consumers (reference: simple/TicketConfirmationConsumer.java:49-73 —
the email-per-record sink becomes a foreachBatch callback).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def file_stream_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """Directory-watching streaming source; every appended file
    becomes (part of) a microbatch, giving tests deterministic
    arrival-order control (the pipeInput analogue)."""
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def start_memory_sink(
    df: DataFrame,
    name: str,
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Sink a streaming DataFrame to an in-memory table readable as
    ``spark.sql(f"select * from {name}")`` — the readable output-topic
    analogue of the reference's TopologyTestDriver tests."""
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix=f"ckpt-{name}-")
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_foreach_batch_sink(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Side-effecting sink: ``fn(batch_df, batch_id)`` per microbatch
    — the engine's version of the reference's consumer-with-effects
    (email sender, simple/TicketConfirmationConsumer.java:77-131).
    foreachBatch gives at-least-once delivery, same as the reference's
    default guarantee."""
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="ckpt-feb-")
    return (
        df.writeStream.foreachBatch(fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
