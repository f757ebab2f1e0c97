"""Changelog→snapshot compaction: the batch KTable materializer
(operators/compaction.py). Pins upsert semantics, tie-breaking, and
that dynamic partition overwrite leaves untouched partitions' files
alone."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.compaction import (
    compact_changelog,
    upsert_snapshot,
)


def _rows(spark, data):
    return spark.createDataFrame(
        data, "id string, shard string, v string, event_seq long"
    )


def test_compact_changelog_upsert_and_tie_break(spark):
    snap = _rows(spark, [("a", "s1", "old", 1), ("b", "s1", "keep", 2)])
    log = _rows(spark, [("a", "s1", "new", 5), ("a", "s1", "mid", 3),
                        ("c", "s2", "ins", 1)])
    out = {r["id"]: r for r in compact_changelog(snap, log, "id").collect()}
    assert out["a"]["v"] == "new" and out["b"]["v"] == "keep"
    assert out["c"]["v"] == "ins"
    # equal seq: changelog side wins (re-pipe overwrites)
    tie = compact_changelog(
        _rows(spark, [("a", "s1", "old", 7)]),
        _rows(spark, [("a", "s1", "re-piped", 7)]),
        "id",
    ).collect()
    assert tie[0]["v"] == "re-piped"


def test_compact_changelog_bootstrap_without_snapshot(spark):
    log = _rows(spark, [("a", "s1", "v1", 1), ("a", "s1", "v2", 2)])
    out = compact_changelog(None, log, "id").collect()
    assert len(out) == 1 and out[0]["v"] == "v2"


def test_upsert_snapshot_round_trip(spark, tmp_path):
    path = str(tmp_path / "snap")
    upsert_snapshot(spark, path, _rows(
        spark, [("a", "s1", "v1", 1), ("b", "s2", "v1", 1)]), "id")
    upsert_snapshot(spark, path, _rows(spark, [("a", "s1", "v2", 2)]), "id")
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": "v2", "b": "v1"}


def test_upsert_snapshot_dynamic_overwrite_leaves_other_partitions(spark, tmp_path):
    path = str(tmp_path / "snap")
    upsert_snapshot(
        spark, path,
        _rows(spark, [("a", "s1", "v1", 1), ("b", "s2", "v1", 1)]),
        "id", partition_cols=["shard"],
    )
    s2_files = {
        f: os.path.getmtime(os.path.join(path, "shard=s2", f))
        for f in os.listdir(os.path.join(path, "shard=s2"))
        if f.endswith(".parquet")
    }
    upsert_snapshot(
        spark, path, _rows(spark, [("a", "s1", "v2", 2)]),
        "id", partition_cols=["shard"],
    )
    # values: s1 upserted, s2 untouched
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == {"a": "v2", "b": "v1"}
    # files: the s2 directory was not rewritten (same files, same mtimes)
    s2_after = {
        f: os.path.getmtime(os.path.join(path, "shard=s2", f))
        for f in os.listdir(os.path.join(path, "shard=s2"))
        if f.endswith(".parquet")
    }
    assert s2_after == s2_files


def test_streaming_changelog_maintains_snapshot(spark, tmp_path):
    """foreachBatch(upsert_snapshot): a streaming changelog becomes a
    continuously-maintained snapshot table (the docstring's streaming
    tie-in, exercised for real microbatch by microbatch)."""
    from tests import fixtures as fx
    from umn_eda_kafka_stream_processing_spark import schemas
    from umn_eda_kafka_stream_processing_spark.sources.memory import rows_df
    from umn_eda_kafka_stream_processing_spark.streaming.runner import (
        file_stream_source,
        start_foreach_batch_sink,
    )

    src = str(tmp_path / "changelog")
    snap = str(tmp_path / "snapshot")

    def _pipe(rows, start_seq=0):
        rows_df(spark, schemas.EVENT, rows, start_seq=start_seq).coalesce(
            1
        ).write.mode("append").parquet(src)

    _pipe([fx.event("e1", "a1", "v1", 100), fx.event("e2", "a1", "v1", 50)])
    stream = file_stream_source(spark, src, schemas.EVENT, max_files_per_trigger=None)

    def sink(batch_df, batch_id):
        upsert_snapshot(spark, snap, batch_df, "id")

    q = start_foreach_batch_sink(
        stream, sink, checkpoint_dir=str(tmp_path / "ckpt")
    )
    try:
        q.processAllAvailable()
        _pipe([fx.event("e1", "a1", "v9", 250)], start_seq=2)
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["id"]: (r["venueid"], r["capacity"])
           for r in spark.read.parquet(snap).collect()}
    assert got == {"e1": ("v9", 250), "e2": ("v1", 50)}
