"""Partition-pruned reads: the directory layout as the 100 TB index
(sources/parquet.py:write_partitioned)."""

from __future__ import annotations

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.sources.parquet import (
    load_table,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def test_partition_filter_prunes_directories(spark, tmp_path):
    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, out, ["lang"], files_per_partition=2)

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    # semantic check: pruned read returns exactly the en docs
    want = docs.filter(F.col("lang") == "en").count()
    assert back.count() == want
    # a partition filter must NOT appear as a data filter (that would
    # mean rows were read then discarded instead of never listed)
    import re
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is None or "lang" not in pushed.group(1)


def test_files_per_partition_caps_small_files(spark, tmp_path):
    import glob

    docs = load_table(spark, SF_DIR, "documents")
    out = str(tmp_path / "capped")
    write_partitioned(docs, out, ["lang"], files_per_partition=2)
    for d in glob.glob(out + "/lang=*"):
        n = len(glob.glob(d + "/*.parquet"))
        assert 1 <= n <= 2
