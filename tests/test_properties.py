"""Property-based tests (hypothesis): operator semantics vs
brute-force Python reference implementations on randomized inputs.

Kept to few, small examples — each example is a Spark job. The
properties cover the operators whose edge behavior is easiest to get
wrong: as-of inclusivity/ordering, latest-by-key with duplicate
seqs, and top-k tie determinism.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.core import grouped_topk, latest_by_key
from umn_eda_kafka_stream_processing_spark.operators.joins import asof_join

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_keys = st.sampled_from(["k1", "k2"])


@given(
    facts=st.lists(st.tuples(_keys, st.integers(0, 20)), min_size=1, max_size=8),
    updates=st.lists(st.tuples(_keys, st.integers(0, 20)), min_size=1, max_size=8),
)
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, facts, updates):
    # dedupe updates per (key, time): operator contract
    upd = {(k, t): f"v{k}{t}" for k, t in updates}
    fdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(facts)], "k string, t long, fid long"
    )
    udf = spark.createDataFrame(
        [(k, t, v) for (k, t), v in upd.items()], "k string, ut long, val string"
    )
    got = {r["fid"]: r["val"]
           for r in asof_join(fdf, udf, "k", "t", "ut", ["val"], how="left").collect()}
    for i, (k, t) in enumerate(facts):
        cands = [(ut, v) for (uk, ut), v in upd.items() if uk == k and ut <= t]
        want = max(cands)[1] if cands else None
        assert got[i] == want, (i, k, t, cands)


@given(
    rows=st.lists(
        st.tuples(_keys, st.integers(0, 5), st.integers(0, 99)),
        min_size=1, max_size=10,
    ),
)
@settings(**_SETTINGS)
def test_latest_by_key_is_max_seq(spark, rows):
    # unique seq per row (append arrival order to break seq ties the
    # same way Kafka offsets would — the engine requires a total order)
    data = [(k, v, i) for i, (k, _s, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, v long, event_seq long")
    got = {r["k"]: r["v"] for r in latest_by_key(df, "k").collect()}
    want = {}
    for k, v, seq in data:
        want[k] = v  # increasing seq == arrival order
    assert got == want


@given(
    counts=st.lists(
        st.tuples(st.sampled_from(["g1", "g2"]), st.sampled_from("abcde"),
                  st.integers(1, 9)),
        min_size=1, max_size=12, unique_by=lambda t: (t[0], t[1]),
    ),
    k=st.integers(1, 3),
)
@settings(**_SETTINGS)
def test_grouped_topk_deterministic_ties(spark, counts, k):
    df = spark.createDataFrame(counts, "g string, item string, count long")
    out = grouped_topk(
        df, ["g"], [F.col("count").desc(), F.col("item").asc()], k
    ).collect()
    by_group: dict[str, list] = {}
    for r in sorted(out, key=lambda r: (r["g"], r["rank"])):
        by_group.setdefault(r["g"], []).append((r["item"], r["count"]))
    for g in {c[0] for c in counts}:
        rows = [(i, n) for gg, i, n in counts if gg == g]
        want = sorted(rows, key=lambda t: (-t[1], t[0]))[:k]
        assert by_group.get(g, []) == want


@given(
    build=st.sets(st.integers(0, 10_000), min_size=1, max_size=12),
    probe=st.sets(st.integers(0, 10_000), min_size=1, max_size=20),
)
@settings(**_SETTINGS)
def test_bloom_filter_never_false_negative(spark, build, probe):
    """Bloom guarantee under randomized key sets: every build key
    passes the probe predicate, for any m/k — membership is derived
    from the same md5 positions on both sides, so a false negative
    is impossible unless the build/probe hashing drifts apart."""
    from umn_eda_kafka_stream_processing_spark.operators import runtime_filter as rf

    bdf = spark.createDataFrame([(k,) for k in sorted(build)], "k long")
    pdf = spark.createDataFrame(
        [(k,) for k in sorted(build | probe)], "k long"
    )
    words = rf.bloom_build(bdf, "k", m_bits=256, k_hashes=2)
    got = {r["k"]: r["hit"] for r in pdf.withColumn(
        "hit", rf.bloom_might_contain("k", words, m_bits=256, k_hashes=2)
    ).collect()}
    assert all(got[k] for k in build)
