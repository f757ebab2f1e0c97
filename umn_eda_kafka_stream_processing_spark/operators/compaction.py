"""Changelog → snapshot-table compaction (batch KTable materializer).

The reference materializes every KTable into a RocksDB store that
lives as long as the app (builder.table(topic, Materialized.as(
persistentKeyValueStore(...))), samples/PurchaseEventTicket.java:
44-51). On a 100 TB lake the analogous durable object is a parquet
SNAPSHOT TABLE maintained from an append-only changelog: upsert the
latest version of each key, keep everything else untouched.

Spark-first shape — no per-row writes, no driver loops:

* compaction = ``latest_by_key`` (one hash-agg, map-side combined)
  over old-snapshot ∪ changelog;
* the write uses hive partitioning + DYNAMIC partition overwrite
  (``spark.sql.sources.partitionOverwriteMode=dynamic``), so only
  partitions that actually contain changed keys are rewritten — at
  100 TB an upsert touching one day's keys rewrites one day's
  directories, not the table;
* untouched partitions are pruned from the read side too: the old
  snapshot is semi-joined to the changelog's distinct partition
  values (a PartitionFilters-eligible broadcast semi join), so the
  compaction job reads only the partitions it will rewrite.

Streaming tie-in: pass ``upsert_snapshot`` to foreachBatch to turn a
streaming changelog into a continuously-maintained snapshot table
(at-least-once; rewrites are idempotent because compaction is
deterministic by (key, order_col)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from umn_eda_kafka_stream_processing_spark.operators.core import latest_by_key


def compact_changelog(
    snapshot: DataFrame | None,
    changelog: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str = "event_seq",
) -> DataFrame:
    """Latest row per key across old snapshot + new changelog.

    The snapshot must already be one-row-per-key; ties on
    ``order_col`` resolve to the changelog row (upsert overwrites),
    implemented by tagging sides rather than trusting input order.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tagged_new = changelog.withColumn("_src", F.lit(1))
    if snapshot is None:
        merged = tagged_new
    else:
        merged = snapshot.withColumn("_src", F.lit(0)).unionByName(tagged_new)
    # order by (order_col, _src): equal sequence numbers prefer the
    # changelog side — matches KTable re-pipe-overwrites semantics
    compacted = latest_by_key(
        merged, keys, F.struct(F.col(order_col), F.col("_src"))
    )
    return compacted.drop("_src")


def upsert_snapshot(
    spark: SparkSession,
    table_path: str,
    changelog: DataFrame,
    key_cols: str | Sequence[str],
    order_col: str = "event_seq",
    partition_cols: Sequence[str] = (),
) -> None:
    """Upsert a changelog into the parquet snapshot at table_path.

    With ``partition_cols``, only partitions present in the changelog
    are read, compacted, and dynamically overwritten. Without them,
    the whole (assumed modest — a dimension/KTable, not the fact
    lake) snapshot is rewritten.

    CONTRACT: a key's partition values must be stable (the usual
    date/tenant layout). If an update can MOVE a key across
    partitions, the old partition is never read here and would keep
    a stale copy — use the move-aware variant
    (``operators/similarity.py:upsert_ivf_index``) as the template:
    it widens the read set to partitions holding the batch's keys
    and drops partitions the merge emptied.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    partition_cols = list(partition_cols)
    try:
        old = spark.read.parquet(table_path)
    except AnalysisException:  # first write: no snapshot yet
        old = None

    if old is not None and partition_cols:
        touched = changelog.select(*partition_cols).distinct()
        # broadcast semi join on partition values: planned as
        # partition pruning, so untouched directories are never read
        old = old.join(F.broadcast(touched), partition_cols, "left_semi")

    compacted = compact_changelog(old, changelog, keys, order_col)
    if old is not None:
        # the plan reads the same path it overwrites — materialize
        # the merge first or the overwrite would delete its own input
        compacted = compacted.localCheckpoint()

    writer = compacted.write.mode("overwrite")
    if partition_cols:
        # dynamic mode replaces ONLY the partitions this job writes
        writer = writer.partitionBy(*partition_cols).option(
            "partitionOverwriteMode", "dynamic"
        )
    writer.parquet(table_path)
    # drop the session's cached file listing for the path: the old
    # (now deleted) part files otherwise stay visible to future reads
    spark.catalog.refreshByPath(table_path)
