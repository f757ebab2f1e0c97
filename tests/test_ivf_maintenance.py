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


def test_upsert_ivfpq_index_incremental_matches_batch_search(spark, tmp_path):
    """The compressed IVFADC index built over TWO upsert batches must
    serve search results identical to ivfpq_search_topk over the same
    full corpus with the same frozen quantizers — codes encoded in
    different batches are comparable because both quantizers froze."""
    from umn_eda_kafka_stream_processing_spark.operators.similarity import (
        ivfpq_index,
        ivfpq_search_index,
        ivfpq_search_topk,
        upsert_ivfpq_index,
    )
    from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    # train both quantizers once on the full corpus, then freeze
    codes_all, cent, cb = ivfpq_index(
        emb, n_coarse=4, coarse_iters=2, n_sub=8, n_codes=16, pq_iters=1, dim=64
    )
    cent, cb = cent.localCheckpoint(), cb.localCheckpoint()

    path = str(tmp_path / "ivfpq")
    first = emb.filter(F.col("vec_id") % 2 == 0).withColumn("upd_seq", F.lit(0))
    second = emb.filter(F.col("vec_id") % 2 == 1).withColumn("upd_seq", F.lit(1))
    upsert_ivfpq_index(spark, path, first, cent, cb, n_sub=8, dim=64)
    upsert_ivfpq_index(spark, path, second, cent, cb, n_sub=8, dim=64)

    queries = emb.filter(F.col("vec_id") < 5)
    from_index = ivfpq_search_index(
        spark, path, queries, cent, cb, k=3, shortlist=20, n_probe=2,
        n_sub=8, dim=64,
    )
    direct = ivfpq_search_topk(
        queries, codes_all, cent, cb, emb, k=3, shortlist=20, n_probe=2,
        n_sub=8, dim=64,
    )
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert as_set(from_index) == as_set(direct)


def test_upsert_ivfpq_index_update_reencodes_and_moves(spark, tmp_path):
    """An updated vector gets fresh codes AND a fresh bucket: the
    move-aware write path (shared with upsert_ivf_index) must drop the
    old-bucket copy so the stale codes can never match a probe."""
    from umn_eda_kafka_stream_processing_spark.operators.similarity import (
        pq_codebooks,
        upsert_ivfpq_index,
    )

    cent = _centroids(spark)
    corpus = _vecs(
        spark,
        [(1, [1.0, 0.05], 0), (2, [0.9, 0.2], 0), (3, [0.1, 1.0], 0),
         (4, [0.05, 0.9], 0)],
    )
    # tiny codebook on raw corpus residuals' scale: 2 subspaces x 2 codes
    from umn_eda_kafka_stream_processing_spark.operators.similarity import (
        assign_ivf_bucket,
        ivf_residuals,
    )
    res = ivf_residuals(
        corpus, assign_ivf_bucket(corpus, cent), cent
    )
    cb = pq_codebooks(res, n_sub=2, n_codes=2, iters=1, dim=2,
                      vec_col="resid").localCheckpoint()

    path = str(tmp_path / "ivfpq")
    upsert_ivfpq_index(spark, path, corpus, cent, cb, n_sub=2, dim=2)
    before = {r["vec_id"]: r for r in spark.read.parquet(path).collect()}
    assert before[1]["bucket"] == 0

    # vec 1 flips to the y-axis cluster
    upsert_ivfpq_index(
        spark, path,
        _vecs(spark, [(1, [0.02, 1.0], 1)]),
        cent, cb, n_sub=2, dim=2,
    )
    after = spark.read.parquet(path).collect()
    mine = [r for r in after if r["vec_id"] == 1]
    assert len(mine) == 1, "stale old-bucket copy survived"
    assert mine[0]["bucket"] == 1
    assert mine[0]["embedding"] == [0.02, 1.0]
    assert len(after) == 4
