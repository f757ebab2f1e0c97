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


def test_write_sorted_total_order_manifest_and_plan(spark, tmp_path):
    """Sorted-export writer (operators/compaction.py:write_sorted):
    (a) the physical plan is a RangeExchange + per-partition sort —
    never a global single-partition Sort; (b) the written files form
    one total order: manifest ranges are DISJOINT across files and
    concatenating files by manifest order yields the globally sorted
    data; (c) the manifest's per-file min/max/count agree with the
    files' contents."""
    import random

    from pyspark.sql import functions as F

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        write_sorted,
    )

    rng = random.Random(13)
    rows = [(rng.randrange(10_000), i) for i in range(5_000)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = str(tmp_path / "sorted_export")

    # plan proof on the exact pre-write frame shape
    shaped = df.repartitionByRange(8, F.col("k")).sortWithinPartitions(
        F.col("k").asc()
    )
    plan = shaped._jdf.queryExecution().executedPlan().toString()
    import re

    assert "rangepartitioning(k" in plan, plan
    # Sort [cols], <global>, ... — must be the per-partition (false)
    # variant, never a global sort
    sorts = re.findall(r"Sort \[[^\]]*\], (\w+),", plan)
    assert sorts and all(g == "false" for g in sorts), plan
    assert "SinglePartition" not in plan, plan

    manifest = write_sorted(df, out, "k", n_files=8).collect()
    assert 1 < len(manifest) <= 8
    assert sum(m["n_rows"] for m in manifest) == len(rows)
    # disjoint, ordered ranges: each file's max <= next file's min
    # (equal only when one key value straddles... it can't: range
    # partitioning keeps equal keys in one partition, so strictly <)
    for a, b in zip(manifest, manifest[1:]):
        assert a["max_k"] < b["min_k"], (a, b)
    # reading files in manifest order concatenates to the global sort
    got = []
    for m in manifest:
        part = [
            r["k"]
            for r in spark.read.parquet(m["file"])
            .select("k")
            .collect()
        ]
        assert part == sorted(part)
        assert part[0] == m["min_k"] and part[-1] == m["max_k"]
        assert len(part) == m["n_rows"]
        got.extend(part)
    assert got == sorted(k for k, _ in rows)


def test_zonemap_select_lossless_and_pruning(spark, tmp_path):
    """Zone-map read side (operators/compaction.py:zonemap_select):
    for any probe range, reading only the manifest-selected files
    returns exactly the rows a full scan returns (losslessness), and
    on a sorted layout narrow probes actually skip files; stat-less
    manifest rows (NULL min/max) are conservatively kept."""
    import random

    from pyspark.sql import functions as F

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        write_sorted,
        zonemap_select,
    )

    rng = random.Random(7)
    rows = [(rng.randrange(10_000), i) for i in range(5_000)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = str(tmp_path / "zoned")
    man = write_sorted(df, out, "k", n_files=8).collect()

    for lo, hi in [(0, 500), (4_000, 4_100), (9_990, 9_999), (123, 123),
                   (20_000, 30_000)]:
        files = zonemap_select(man, "k", lo, hi)
        expect = sorted((k, v) for k, v in rows if lo <= k <= hi)
        if files:
            got = sorted(
                (r["k"], r["v"])
                for r in spark.read.parquet(*files)
                .filter(F.col("k").between(lo, hi))
                .collect()
            )
        else:
            got = []
        assert got == expect, (lo, hi)
        # narrow probes on the sorted layout must skip files
        if hi - lo <= 500:
            assert len(files) < len(man), (lo, hi, len(files))
    # out-of-domain probe selects nothing
    assert zonemap_select(man, "k", 20_000, 30_000) == []

    # stat-less rows are kept, never skipped
    class _Row(dict):
        def __getitem__(self, k):
            return dict.__getitem__(self, k)

    nostat = _Row(file="f0", min_k=None, max_k=None)
    assert zonemap_select([nostat], "k", 0, 1) == ["f0"]


def test_write_range_sharded_deterministic_and_disjoint(spark, tmp_path):
    import random

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        equidepth_bounds,
        partition_checksums,
        write_range_sharded,
    )

    rng = random.Random(3)
    # heavy ties at 500: boundary ties must never split across shards
    rows = [(i, rng.choice([rng.randint(0, 1000), 500])) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, x long")
    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    b1 = write_range_sharded(df, p1, "x", 8, tiebreak_cols=("k",))
    b2 = write_range_sharded(df, p2, "x", 8, tiebreak_cols=("k",))
    assert b1 == b2 == sorted(b1)  # exact bounds: identical runs

    out = spark.read.parquet(p1)
    got = {
        r["shard"]: (r["mn"], r["mx"], r["n"])
        for r in out.groupBy("shard")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"),
             F.count("*").alias("n"))
        .collect()
    }
    # value-disjoint: shard i's max <= shard i+1's min, and a value
    # never appears in two shards
    shards = sorted(got)
    for a, b in zip(shards, shards[1:]):
        assert got[a][1] <= got[b][0]
    vals = out.select("shard", "x").distinct()
    assert (
        vals.groupBy("x").count().filter(F.col("count") > 1).count() == 0
    )
    # both exports content-equivalent per partition (the digest is
    # order-independent; (x, k) is a total order, so these runs are
    # also byte-identical — the tiebreak_cols contract)
    c1 = {r["shard"]: (r["n_rows"], r["checksum"])
          for r in partition_checksums(
              spark.read.parquet(p1), "shard", ["k", "x"]).collect()}
    c2 = {r["shard"]: (r["n_rows"], r["checksum"])
          for r in partition_checksums(
              spark.read.parquet(p2), "shard", ["k", "x"]).collect()}
    assert c1 == c2
    # bounds replica: python type-1 quantiles
    xs = sorted(x for _, x in rows)
    exp = [xs[(i * len(xs) + 7) // 8 - 1] for i in range(1, 8)]
    assert b1 == exp
