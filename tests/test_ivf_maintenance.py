"""Incremental IVF index maintenance (operators/similarity.py:
upsert_ivf_index): bucket-partitioned parquet index kept fresh by
changelog upserts, queryable via ivf_topk between batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.similarity import (
    assign_ivf_bucket,
    ivf_topk,
    upsert_ivf_index,
)


def _centroids(spark):
    # two orthogonal unit centroids: bucket 0 = x-axis, bucket 1 = y-axis
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "bucket int, embedding array<double>",
    )


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, upd_seq long"
    )


def test_assign_ivf_bucket_max_cosine(spark):
    out = assign_ivf_bucket(
        _vecs(spark, [(1, [0.9, 0.1], 0), (2, [0.2, 0.8], 0)]),
        _centroids(spark),
    )
    got = {r["vec_id"]: r["bucket"] for r in out.collect()}
    assert got == {1: 0, 2: 1}


def test_upsert_ivf_index_insert_update_and_query(spark, tmp_path):
    path = str(tmp_path / "ivf")
    cent = _centroids(spark)
    upsert_ivf_index(
        spark, path,
        _vecs(spark, [(1, [1.0, 0.05], 0), (2, [0.9, 0.2], 0),
                      (3, [0.1, 1.0], 0)]),
        cent,
    )
    # vec 2 updated in place (stays bucket 0); vec 4 inserted
    upsert_ivf_index(
        spark, path,
        _vecs(spark, [(2, [0.95, 0.1], 1), (4, [0.05, 0.9], 1)]),
        cent,
    )
    index = spark.read.parquet(path)
    rows = {r["vec_id"]: r for r in index.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["embedding"] == [0.95, 0.1] and rows[2]["bucket"] == 0
    # the maintained index serves ANN queries with bucket pruning
    q = _vecs(spark, [(100, [1.0, 0.0], 0)]).drop("upd_seq")
    top = ivf_topk(q, index, cent, k=2, n_probe=1).collect()
    assert [r["neighbor_id"] for r in top] == [1, 2]


def test_upsert_ivf_index_cross_bucket_move_clears_stale_row(spark, tmp_path):
    path = str(tmp_path / "ivf")
    cent = _centroids(spark)
    # bucket 1 holds ONLY vec 9
    upsert_ivf_index(
        spark, path,
        _vecs(spark, [(8, [1.0, 0.1], 0), (9, [0.1, 1.0], 0)]),
        cent,
    )
    # vec 9 drifts to the x-axis: moves bucket 1 -> 0, emptying bucket 1
    upsert_ivf_index(
        spark, path, _vecs(spark, [(9, [1.0, 0.05], 1)]), cent,
    )
    index = spark.read.parquet(path)
    rows = {r["vec_id"]: r["bucket"] for r in index.collect()}
    assert rows == {8: 0, 9: 0}  # no stale bucket-1 copy of vec 9
    assert not os.path.exists(os.path.join(path, "bucket=1"))


def test_upsert_ivf_index_untouched_bucket_not_rewritten(spark, tmp_path):
    path = str(tmp_path / "ivf")
    cent = _centroids(spark)
    upsert_ivf_index(
        spark, path,
        _vecs(spark, [(1, [1.0, 0.1], 0), (2, [0.1, 1.0], 0)]),
        cent,
    )
    b1 = os.path.join(path, "bucket=1")
    before = {f: os.path.getmtime(os.path.join(b1, f))
              for f in os.listdir(b1) if f.endswith(".parquet")}
    upsert_ivf_index(  # only touches bucket 0
        spark, path, _vecs(spark, [(5, [0.9, 0.0], 1)]), cent,
    )
    after = {f: os.path.getmtime(os.path.join(b1, f))
             for f in os.listdir(b1) if f.endswith(".parquet")}
    assert after == before
