"""Unit tests for the train-once session cache (caching.py): the
conf-driven shared base dir (a cluster needs shared storage — the
driver-local tempdir fallback only works on local[n]) and path
injectivity in the cache key (the readable slug is lossy; two keys
must never alias one parquet path)."""

from __future__ import annotations

import os

from umn_eda_kafka_stream_processing_spark import caching
from umn_eda_kafka_stream_processing_spark.caching import (
    CACHE_DIR_CONF,
    _slug,
    materialized,
)


def test_slug_distinct_for_collapsing_keys():
    # '|' and '/' both collapse to '_' in the readable prefix — the
    # md5 suffix must keep the paths distinct
    a, b = _slug("model|sf0.01"), _slug("model/sf0.01")
    assert a != b
    # and long keys differing only past the 120-char truncation point
    base = "k" * 150
    assert _slug(base + "A") != _slug(base + "B")


def test_materialized_uses_conf_dir_and_is_write_once(spark, tmp_path):
    root = str(tmp_path / "shared_cache")
    old = spark.conf.get(CACHE_DIR_CONF, None)
    app = spark.sparkContext.applicationId
    # the per-app base dir memoizes on first use; clear so the conf
    # takes effect for this app inside the shared test session
    caching._DIRS.pop(app, None)
    spark.conf.set(CACHE_DIR_CONF, root)
    builds = []
    try:
        def build():
            builds.append(1)
            return spark.range(5).withColumnRenamed("id", "v")

        key = "test-conf-dir|corpus=x"
        got1 = materialized(spark, key, build)
        got2 = materialized(spark, key, build)
        assert len(builds) == 1  # train once
        assert sorted(r["v"] for r in got2.collect()) == [0, 1, 2, 3, 4]
        expected = os.path.join(root, app, _slug(key))
        assert os.path.isdir(expected)
        # the frame reads from the conf-rooted path, not a tempdir
        assert any(
            expected in f for f in got1.inputFiles()
        ), got1.inputFiles()
    finally:
        caching._FRAMES.pop((app, "test-conf-dir|corpus=x"), None)
        caching._DIRS.pop(app, None)
        if old is None:
            spark.conf.unset(CACHE_DIR_CONF)
        else:
            spark.conf.set(CACHE_DIR_CONF, old)
