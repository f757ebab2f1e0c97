"""Foreign-key KTable ⋈ KTable join (the KIP-213 analogue).

Kafka Streams' ``KTable.join(other, foreignKeyExtractor, ...)``
(SURVEY.md §2.3 engine-scope extension; the reference app only has
primary-key table joins) joins a table to another table through a
NON-KEY column, with full update propagation in both directions —
critically, an update to the RIGHT table re-emits the joined row for
EVERY left row referencing it (Kafka Streams implements this with a
subscription topic re-keyed by FK; ~the hardest operator in that
runtime).

The Spark shape: both tables are compacted snapshot stores
(operators/compaction.py:upsert_snapshot — this engine's KTable
materialization), each maintained by its own changelog stream via
foreachBatch. Update propagation is driven by AFFECTED-KEY pruning,
not a full re-join:

* left changelog batch → upsert the left store; the affected left
  keys are exactly the batch's keys; join just those rows against
  the right store.
* right changelog batch → upsert the right store; the affected left
  rows are ``left_store semi-join batch's right keys ON the FK``
  (the subscription-topic lookup, as one equi-join); join those
  against the right store.

Both emission joins broadcast the right store (a dimension-sized
KTable — the case FK joins exist for); the left store read is
row-pruned by a broadcast semi-join on the affected keys/FKs, so the
JOIN work per batch is O(|batch| + |affected|), never O(|left
table|). The left-store SCAN itself is full-width here (plain
parquet); at 100 TB, hive-partition the store by a bucket of the FK
(pmod(hash(fk), N) — upsert_snapshot's partition_cols) so the
right-batch path partition-prunes to the touched FK buckets, the
exact layout upsert_ivfpq_index uses. Emission is at-least-once
(foreachBatch) in update mode: downstream consumers key by the left
key and keep the latest, exactly like consuming a KTable changelog
topic.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from umn_eda_kafka_stream_processing_spark.operators.compaction import upsert_snapshot


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def fk_join_snapshot(
    left: DataFrame,
    right: DataFrame,
    fk_col: str,
    right_key: str,
    how: str = "inner",
) -> DataFrame:
    """Join (a pruned slice of) the left KTable snapshot to the right
    KTable snapshot through the foreign key. Right side broadcasts
    (the dimension table FK joins exist for)."""
    rt = right.withColumnRenamed(right_key, "_fk_rk")
    return left.join(
        F.broadcast(rt), F.col(fk_col) == F.col("_fk_rk"), how
    ).drop("_fk_rk")


def start_fk_table_join(
    left_stream: DataFrame,
    right_stream: DataFrame,
    *,
    left_key: str,
    fk_col: str,
    right_key: str,
    left_store: str,
    right_store: str,
    emit: Callable[[DataFrame, int], None],
    order_col: str = "event_seq",
    how: str = "inner",
    checkpoint_root: str | None = None,
) -> tuple[StreamingQuery, StreamingQuery]:
    """Wire both changelog streams into the FK-join topology; returns
    the two StreamingQuery handles (left-side maintainer, right-side
    maintainer). ``emit`` receives the refreshed joined rows for the
    affected left keys after every microbatch of either side."""
    root = checkpoint_root or tempfile.mkdtemp(prefix="ckpt-fkjoin-")

    def on_left_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()  # read store + write store below
        upsert_snapshot(spark, left_store, batch_df, left_key, order_col)
        left_snap = _read_or_none(spark, left_store)
        right_snap = _read_or_none(spark, right_store)
        if right_snap is None:
            return  # inner: nothing to join against yet; rows surface
            # when the right store first materializes (its batch
            # re-emits every referencing left row)
        affected = batch_df.select(left_key).distinct()
        pruned = left_snap.join(F.broadcast(affected), left_key, "left_semi")
        emit(fk_join_snapshot(pruned, right_snap, fk_col, right_key, how), batch_id)

    def on_right_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()
        upsert_snapshot(spark, right_store, batch_df, right_key, order_col)
        left_snap = _read_or_none(spark, left_store)
        if left_snap is None:
            return  # nothing references anything yet
        # the KIP-213 subscription lookup: every left row whose FK is
        # one of the batch's right keys is affected — ONE broadcast
        # semi-join, not a scan-compare
        touched = batch_df.select(F.col(right_key).alias(fk_col)).distinct()
        affected = left_snap.join(F.broadcast(touched), fk_col, "left_semi")
        right_snap = _read_or_none(spark, right_store)
        emit(fk_join_snapshot(affected, right_snap, fk_col, right_key, how), batch_id)

    lq = (
        left_stream.writeStream.foreachBatch(on_left_batch)
        .outputMode("update")
        .option("checkpointLocation", f"{root}/left")
        .start()
    )
    rq = (
        right_stream.writeStream.foreachBatch(on_right_batch)
        .outputMode("update")
        .option("checkpointLocation", f"{root}/right")
        .start()
    )
    return lq, rq
