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
