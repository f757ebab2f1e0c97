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
  at or below a horizon merge into ONE baseline row per group in the
  newest folded batch's partition (the generic
  `compaction.collapse_batch_registers` shape shared with the
  CMS/HLL/benchmark-gram stores: clamp to a real ingested batch,
  marker written before the deletes, upsert guard no-ops straggler
  replays at/below the horizon, readers exclude stale sub-horizon
  directories so a crashed collapse self-heals).

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
    (`compaction.upsert_batch_partition`).

    A batch at or below the store's collapse horizon
    (`collapse_agg_view`) NO-OPS: a replay of a folded batch would
    re-add mass the baseline already contains, and a replay of the
    base batch itself would overwrite the folded baseline with
    single-batch partials. Metadata-only guard (one FS listing),
    same as the CMS/HLL/gram stores."""
    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        read_collapse_horizon,
        upsert_batch_partition,
    )

    horizon = read_collapse_horizon(spark, store_path)
    if horizon is not None and int(batch_id) <= horizon:
        return  # at/below the collapse horizon: already in the fold

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
    salted_agg contract). Batches below the collapse horizon are
    excluded: they are stale leftovers of a collapse that crashed
    between its marker write and its directory deletes — summing
    them would double-count (the CMS crash-recovery rule)."""
    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        read_collapse_horizon,
    )

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    df = spark.read.parquet(store_path)
    horizon = read_collapse_horizon(spark, store_path)
    if horizon is not None:
        df = df.filter(F.col("batch_id") >= int(horizon))
    return df.groupBy(*groups).agg(*final_aggs)


def collapse_agg_view(
    spark: SparkSession,
    store_path: str,
    group_cols: str | Sequence[str],
    merge_aggs: Sequence[Column],
    upto_batch_id: int,
) -> dict:
    """Fold all batches with ``batch_id <= upto_batch_id`` into ONE
    baseline partial row per group — the state-retention step that
    keeps the store O(|groups|) + O(window) instead of
    O(|batches|·|groups|).

    ``merge_aggs`` re-combine partials into partials of the same
    aliases (for distributive aggregates they are the final aggs:
    sum(s) AS s, min(mn) AS mn, ...). One
    `compaction.collapse_batch_registers` call — which supplies the
    shape shared with the CMS/HLL/benchmark-gram stores: the horizon
    clamps to the largest INGESTED batch <= it and the fold lands in
    that REAL batch's partition (no synthetic ``-1`` baseline: a
    synthetic id below every real id cannot carry the horizon marker
    the crash-safety ordering needs); only folded partitions are read
    (partition-pruned) and deleted; the ``_collapse_horizon_N`` marker
    lands BEFORE the deletes so a crashed collapse self-heals
    (readers and the next collapse ignore/sweep stale sub-horizon
    directories); `upsert_agg_view` no-ops straggler replays at/below
    the horizon. Idempotent: a second collapse with the same horizon
    is a no-op.

    CONTRACT: collapse only batches beyond the stream's replay
    horizon — a replayed batch_id <= the horizon would re-add its
    mass (exactly the checkpoint-retention contract); the marker
    guard downgrades a violating replay to a no-op.

    Returns stats: ``batches_folded``, ``groups``."""
    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        collapse_batch_registers,
    )

    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    res = collapse_batch_registers(
        spark,
        store_path,
        upto_batch_id,
        lambda df: df.groupBy(*groups).agg(*merge_aggs),
    )
    return {"batches_folded": res["batches_folded"], "groups": res["rows"]}
