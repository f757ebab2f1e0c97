"""Incrementally-maintained aggregate views (continuous GROUP BY).

The reference's KTable aggregations (count()/reduce() over a grouped
stream, e.g. samples/PurchaseEventTicket.java's running counts) keep
a continuously-updated aggregate table in RocksDB. The lake-side
analogue every pipeline reinvents is "a parquet table holding
GROUP BY results that stays current as microbatches land". This
module is that shape, generalized to ANY distributive aggregate and
made REPLAY-SAFE by the family rule the CMS/constraint/histogram
stores established:

* each batch writes its PARTIAL aggregates keyed by
  ``(batch_id, *group_cols)`` through the latest-wins upsert — a
  replayed batch recomputes IDENTICAL partials and the write is a
  no-op (read-modify-add merges would double-count under
  foreachBatch's at-least-once delivery);
* the view's current value is RE-AGGREGATED across batch_ids at
  read (the count-at-read rule) with the caller's FINAL aggregates —
  the `salted_agg` partial/final split signature, so sum→sum,
  count→sum, min→min, max→max, avg→(sum, count) partials compose;
* unbounded batch history is folded by `collapse_agg_view`: batches
  at or below a horizon merge into ONE synthetic baseline row per
  group (batch_id = the collapse target, default -1). Safe once the
  horizon is beyond the stream's replay window (a replay of a
  collapsed batch_id would re-add its mass — the caller's contract,
  same as checkpoint retention).

Scale shape: the store holds |batches| x |groups| partial rows,
hive-partitioned by batch_id so each upsert touches ONLY its own
directory and the collapse prunes exactly the folded partitions;
reads are one hash-agg over the store (map-side combined). With
periodic collapse the store is O(|groups|) + O(window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def upsert_agg_view(
    spark: SparkSession,
    store_path: str,
    batch_df: DataFrame,
    group_cols: str | Sequence[str],
    partial_aggs: Sequence[Column],
    batch_id: int,
) -> None:
    """Land one microbatch's PARTIAL aggregates (foreachBatch shape).

    ``partial_aggs`` run per group within this batch only; their
    aliases are the store's value columns. BATCH-KEYED (partials are
    a pure function of the batch): each batch's rows rewrite their
    own ``batch_id=N`` partition via dynamic overwrite — a replay
    recomputes identical rows, no store read, no merge
    (`compaction.upsert_batch_partition`)."""
    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        upsert_batch_partition,
    )

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    part = batch_df.groupBy(*groups).agg(*partial_aggs)
    upsert_batch_partition(spark, store_path, part, batch_id)


def read_agg_view(
    spark: SparkSession,
    store_path: str,
    group_cols: str | Sequence[str],
    final_aggs: Sequence[Column],
) -> DataFrame:
    """The view's current value: FINAL aggregates re-combining the
    per-batch partials across all batch_ids (one map-side-combined
    hash-agg over the store). ``final_aggs`` reference the partials'
    aliases (partial ``sum(x) AS s`` → final ``sum(s) AS s`` — the
    salted_agg contract)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    return (
        spark.read.parquet(store_path)
        .groupBy(*groups)
        .agg(*final_aggs)
    )


def collapse_agg_view(
    spark: SparkSession,
    store_path: str,
    group_cols: str | Sequence[str],
    merge_aggs: Sequence[Column],
    upto_batch_id: int,
    into_batch_id: int = -1,
) -> dict:
    """Fold all batches with ``batch_id <= upto_batch_id`` (including
    a previous collapse row at ``into_batch_id``) into ONE baseline
    partial row per group at ``into_batch_id`` — the state-retention
    step that keeps the store O(|groups|) + O(window) instead of
    O(|batches|·|groups|).

    ``merge_aggs`` re-combine partials into partials of the same
    aliases (for distributive aggregates they are the final aggs:
    sum(s) AS s, min(mn) AS mn, ...). Only folded batch_id
    partitions are read (partition-pruned) and deleted; untouched
    batches' files are never opened. Idempotent: a second collapse
    with the same horizon reads just the baseline row and rewrites
    it identically.

    CONTRACT: collapse only batches beyond the stream's replay
    horizon — a replayed batch_id <= the horizon would re-add its
    mass (exactly the checkpoint-retention contract).

    Returns stats: ``batches_folded``, ``groups``."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if into_batch_id > upto_batch_id:
        raise ValueError(
            f"into_batch_id {into_batch_id} must be <= upto_batch_id "
            f"{upto_batch_id} (the baseline row must fold into itself "
            "on the next collapse)"
        )
    try:
        store = spark.read.parquet(store_path)
    except AnalysisException:
        return {"batches_folded": 0, "groups": 0}
    old = store.filter(F.col("batch_id") <= int(upto_batch_id))
    batch_ids = [
        r["batch_id"]
        for r in old.select("batch_id").distinct().collect()
    ]
    if not batch_ids or batch_ids == [int(into_batch_id)]:
        return {"batches_folded": 0, "groups": 0}
    folded = (
        old.groupBy(*groups)
        .agg(*merge_aggs)
        .withColumn("batch_id", F.lit(int(into_batch_id)))
        # keep the upsert_snapshot store schema (event_seq column) so
        # post-collapse upserts and reads see one consistent footer
        .withColumn("event_seq", F.lit(0))
        .localCheckpoint()  # reads the partitions the write replaces
    )
    n_groups = folded.count()
    (
        folded.write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store_path)
    )
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    for b in batch_ids:
        if int(b) == int(into_batch_id):
            continue  # just rewritten with the folded baseline
        p = jvm.org.apache.hadoop.fs.Path(f"{store_path}/batch_id={b}")
        p.getFileSystem(conf).delete(p, True)
    spark.catalog.refreshByPath(store_path)
    return {
        "batches_folded": len(
            [b for b in batch_ids if int(b) != int(into_batch_id)]
        ),
        "groups": int(n_groups),
    }
