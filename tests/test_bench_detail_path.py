"""Pin the bench-detail no-clobber rule (round-13 verdict task 1).

The committed BENCH_DETAIL.json is the full-coverage warm artifact; a
smoke / hard-capped / noisy / sharded pass must never silently replace
it (it did at r12 and again at r13's final commit). Spark-free test:
resolve_detail_path is pure.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

COMPLETE = {"skipped": [], "cold_only": [], "noisy": False}


def test_complete_run_writes_committed_path():
    p = bench.resolve_detail_path(dict(COMPLETE), environ={})
    assert p.endswith(os.sep + "BENCH_DETAIL.json")


def test_skipped_queries_divert_to_partial():
    d = dict(COMPLETE, skipped=["q1"])
    assert bench.resolve_detail_path(d, environ={}).endswith("BENCH_DETAIL.partial.json")


def test_cold_only_diverts_to_partial():
    d = dict(COMPLETE, cold_only=["q1"])
    assert bench.resolve_detail_path(d, environ={}).endswith("BENCH_DETAIL.partial.json")


def test_noisy_diverts_to_partial():
    d = dict(COMPLETE, noisy=True)
    assert bench.resolve_detail_path(d, environ={}).endswith("BENCH_DETAIL.partial.json")


def test_shard_pass_diverts_to_partial():
    d = dict(COMPLETE, shard="0/3")
    assert bench.resolve_detail_path(d, environ={}).endswith("BENCH_DETAIL.partial.json")


def test_commit_override_allows_clobber():
    d = dict(COMPLETE, skipped=["q1"])
    p = bench.resolve_detail_path(d, environ={"SPARK_GRAFT_BENCH_COMMIT": "1"})
    assert p.endswith(os.sep + "BENCH_DETAIL.json")


def test_explicit_env_path_always_honored():
    d = dict(COMPLETE, skipped=["q1"], noisy=True)
    p = bench.resolve_detail_path(
        d, environ={"SPARK_GRAFT_BENCH_DETAIL": "/tmp/bd0.json"}
    )
    assert p == "/tmp/bd0.json"


def test_order_by_prior_cost_costliest_first_new_first():
    """Hard-cap skips must land on the cheap tail: costliest-first by
    last-known median, never-benched queries first of all, ties and
    the no-artifact case keep the input order."""
    out = bench.order_by_prior_cost(
        ["a", "b", "c", "d"], {"a": 1.0, "b": 5.0, "d": 2.0}
    )
    assert out == ["c", "b", "d", "a"]
    assert bench.order_by_prior_cost(["x", "y"], {}) == ["x", "y"]
    # equal medians keep input order (deterministic shard merges)
    assert bench.order_by_prior_cost(
        ["p", "q"], {"p": 1.0, "q": 1.0}
    ) == ["p", "q"]
