"""Physical-plan audit for every catalog query.

Prints, per query, the operators Catalyst chose — join strategies,
exchange (shuffle) count, scan pushdown — and flags patterns that
would hurt at 100 TB:

* CartesianProduct / BroadcastNestedLoopJoin on non-trivial inputs
* parquet scans with no ReadSchema pruning (SELECT *)
* more exchanges than expected for the query shape
* unpartitioned Window nodes (global single-task sort — the
  "No Partition Defined for Window operation" runtime warning)

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umn_eda_kafka_stream_processing_spark.plans import REGISTRY
from umn_eda_kafka_stream_processing_spark.session import get_spark

INTERESTING = (
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
    "Exchange", "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "Window", "WindowGroupLimit", "Generate", "Sort ",
)

# Per-query ASSERTIONS (regressions flag the lint, not just the
# eyeball). The dedup/similarity family's scale claim is "bucketed /
# banded, never all-pairs": a CartesianProduct or
# BroadcastNestedLoopJoin in these plans means a banding key got lost
# (e.g. a refactor turned the equi band join into a theta join).
# NOTE intentionally absent: ann_cosine_topk / ann_ivf_* /
# user_activity_similarity — their broadcast-crossjoin (query set x
# corpus / centroids) IS the declared linear-scan shape.
FORBID_JOINS = {
    "minhash_lsh_pairs": ("CartesianProduct", "BroadcastNestedLoopJoin"),
    "embedding_srp_lsh_pairs": ("CartesianProduct", "BroadcastNestedLoopJoin"),
    "user_activity_similarity_lsh": ("CartesianProduct", "BroadcastNestedLoopJoin"),
    "simhash_near_pairs": ("CartesianProduct", "BroadcastNestedLoopJoin"),
    "near_dup_clusters": ("CartesianProduct", "BroadcastNestedLoopJoin"),
    "dedup_pipeline_summary": ("CartesianProduct",),  # final 1-row crossJoins are BNLJ-shaped by design
    "embedding_near_dup_pairs": ("CartesianProduct", "BroadcastNestedLoopJoin"),
    "ngram_jaccard_pairs": ("CartesianProduct",),
    # PQ: the ADC pass intentionally BNLJ-broadcasts the tiny per-query
    # LUTs against the code scan (the declared linear-scan shape); a
    # CartesianProduct would mean the broadcast was lost.
    "ann_pq_topk": ("CartesianProduct",),
    "semantic_dedup_pairs": ("CartesianProduct", "BroadcastNestedLoopJoin"),
}

# Queries whose lazy final plan must carry an explicit-count
# repartition (REPARTITION_BY_NUM): the guard against AQE coalescing
# a tiny shuffle to ~1 partition right before expensive per-pair
# work (CLAUDE.md trap). Queries that materialize stages via
# localCheckpoint hide the marker from the final plan string and are
# receipted in PLAN_PROOFS.md instead.
REQUIRE_MARKERS = {
    "embedding_srp_lsh_pairs": "REPARTITION_BY_NUM",
    "user_activity_similarity_lsh": "REPARTITION_BY_NUM",
    "ngram_jaccard_pairs": "REPARTITION_BY_NUM",
    "embedding_near_dup_pairs": "REPARTITION_BY_NUM",
}


def unpartitioned_windows(plan: str) -> int:
    """Count Window physical nodes with an empty partition spec.

    WindowExec's simple string is ``Window [exprs], [partSpec],
    [orderSpec]`` — with no partitioning the middle group is omitted,
    leaving exactly one ``], [`` separator instead of two. Such a node
    moves ALL rows to one task (Spark warns "No Partition Defined for
    Window operation"); the engine's rule is that any global ranking
    goes through operators.core.global_topk instead.
    """
    n = 0
    # Window [exprs], [partSpec], [orderSpec] — partitioned has two
    # "], [" separators, unpartitioned one. A partition-only window
    # (e.g. count() OVER (PARTITION BY k) with no ORDER BY) also has
    # one separator but is harmless — each partition aggregates
    # independently, no global sort. Distinguish by the sort markers
    # only an order spec carries.
    for m in re.finditer(r"\bWindow (\[.*)$", plan, re.M):
        if m.group(1).count("], [") < 2:
            last_group = m.group(1).rsplit("], [", 1)[-1]
            if " ASC" in last_group or " DESC" in last_group:
                n += 1
    # WindowGroupLimit [partSpec], [orderSpec], rankFn, k, mode —
    # partitioned has one separator, unpartitioned none.
    for m in re.finditer(r"\bWindowGroupLimit (\[.*)$", plan, re.M):
        if m.group(1).count("], [") < 1:
            n += 1
    return n


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="explain-audit")
    # plan node strings truncate ReadSchema at 100 chars by default;
    # an unclosed struct< would defeat the wide-scan check below
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    warn = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        df = spec.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        counts = Counter()
        for marker in INTERESTING:
            n = plan.count(marker)
            if n:
                counts[marker.strip()] = n
        flags = []
        if counts.get("CartesianProduct"):
            flags.append("CARTESIAN")
        if counts.get("SortMergeJoin"):
            flags.append("SMJ")
        for bad in FORBID_JOINS.get(name, ()):
            if bad in plan and f"FORBIDDEN:{bad}" not in flags:
                flags.append(f"FORBIDDEN:{bad}")
        marker = REQUIRE_MARKERS.get(name)
        if marker and marker not in plan:
            flags.append(f"MISSING:{marker}")
        if unpartitioned_windows(plan):
            flags.append("UNPART-WINDOW")
        # scans reading every column of a wide table
        # [^>\n]: a schema the metadata limit still truncated has no
        # closing > on its line — never let the match run across lines
        for m in re.finditer(r"ReadSchema: struct<([^>\n]*)>", plan):
            if m.group(1).count(",") >= 7:
                flags.append("WIDE-SCAN")
                break
        line = ", ".join(f"{k}={v}" for k, v in sorted(counts.items()))
        mark = " !! " + ",".join(flags) if flags else ""
        print(f"  {name:34s} {line}{mark}")
        if flags:
            warn += 1
    print(f"{warn} queries flagged")
    # nonzero exit on any flag so CI / pytest can gate on the audit
    return 1 if warn else 0


if __name__ == "__main__":
    raise SystemExit(main())
