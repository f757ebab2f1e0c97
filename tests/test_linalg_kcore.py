"""Unit tests for fixed-point linear algebra (operators/linalg.py),
k-core peeling, and the key-skew census — each against an
independent Python/numpy reference."""

from __future__ import annotations

import collections
import math
import random

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.graph import (
    core_numbers,
    k_core,
)
from umn_eda_kafka_stream_processing_spark.operators.linalg import (
    gram_micro,
    power_iteration,
)
from umn_eda_kafka_stream_processing_spark.operators.skew import key_skew_census


def test_gram_micro_matches_numpy_integer_gram(spark):
    import numpy as np

    rng = random.Random(13)
    rows = [
        (i, [rng.uniform(-0.5, 0.5) for _ in range(4)]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    gram, _ = gram_micro(df)
    got = {(r["i"], r["j"]): r["g"] for r in gram.collect()}
    X = np.array([v for _, v in rows])
    M = np.floor(X * 1e6 + 0.5).astype(np.int64)
    C = M.T @ M
    n = len(rows)
    for i in range(4):
        for j in range(4):
            expect = int(C[i, j]) // (n * 1000)
            if C[i, j] < 0:  # trunc-div, not floor-div
                expect = -((-int(C[i, j])) // (n * 1000))
            assert got[(i + 1, j + 1)] == expect


def test_gram_micro_exact_past_bigint_overflow(spark):
    """The DECIMAL(38,0) partial-sum path: element micros of ~3e9
    (|x| = 3000) give per-term products of 9e18 — just inside BIGINT
    — whose 4-row sum (3.6e19) wraps int64. The decimal gram must
    return the exact scaled value, not a wrapped one."""
    x = 3000.0  # m = 3_000_000_000
    rows = [(i, [x, -x]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    gram, _ = gram_micro(df)
    got = {(r["i"], r["j"]): r["g"] for r in gram.collect()}
    m = int(x * 1e6)  # 3e9, exact
    c_diag = 4 * m * m  # 3.6e19 > 2^63: overflows BIGINT, not DECIMAL
    assert c_diag > 2**63
    expect_diag = c_diag // (4 * 1000)
    expect_off = -((4 * m * m) // (4 * 1000))  # trunc-div on negatives
    assert got[(1, 1)] == got[(2, 2)] == expect_diag
    assert got[(1, 2)] == got[(2, 1)] == expect_off


def _fixed_point_power(G, iters, norm_shift):
    dim = len(G)
    v = [125000] * dim
    for _ in range(iters):
        w = []
        for i in range(dim):
            s = 0
            for j in range(dim):
                prod = G[i][j] * v[j]
                q = abs(prod) // 1000000
                s += q if prod >= 0 else -q
            w.append(s)
        u = [int(math.copysign(abs(x) // norm_shift, x)) for x in w]
        nrm = int(math.floor(math.sqrt(float(sum(x * x for x in u)))))
        v = [
            int(math.copysign(abs(x * 1000000) // max(nrm, 1), x))
            for x in u
        ]
    return v


def test_power_iteration_matches_python_reference(spark):
    G = [
        [5_000_000_000, 1_000_000_000, 0],
        [1_000_000_000, 2_000_000_000, 500_000_000],
        [0, 500_000_000, 1_000_000_000],
    ]
    rows = [
        (i + 1, j + 1, G[i][j]) for i in range(3) for j in range(3)
    ]
    df = spark.createDataFrame(rows, "i long, j long, g long")
    got = {
        r["pos"]: r["v_micro"]
        for r in power_iteration(df, iterations=4).collect()
    }
    expect = _fixed_point_power(G, 4, 1000)
    assert [got[p + 1] for p in range(3)] == expect
    # and it converged toward the dominant direction (top eigval ~5.2e9,
    # eigvec heavily on coordinate 1)
    assert got[1] > got[2] > got[3] > 0


def test_k_core_matches_bruteforce_peel(spark):
    rng = random.Random(21)
    nodes = list(range(20))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)}
    )
    df = spark.createDataFrame(edges, "a long, b long")
    core, rounds, converged = k_core(df, k=3, max_rounds=10)
    got = {(r["a"], r["b"]) for r in core.collect()}
    E = set(edges)
    while True:
        deg = collections.Counter()
        for a, b in E:
            deg[a] += 1
            deg[b] += 1
        keep = {n for n, d in deg.items() if d >= 3}
        E2 = {(a, b) for a, b in E if a in keep and b in keep}
        if E2 == E:
            break
        E = E2
    assert got == E
    assert converged and rounds <= 10


def _py_core_numbers(edges):
    """Textbook min-degree peeling — the independent reference."""
    import heapq

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(nb) for v, nb in adj.items()}
    h = [(d, v) for v, d in deg.items()]
    heapq.heapify(h)
    alive = set(adj)
    core, k = {}, 0
    while h:
        d, v = heapq.heappop(h)
        if v not in alive or d != deg[v]:
            continue
        k = max(k, d)
        core[v] = k
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
                heapq.heappush(h, (deg[u], u))
    return core


def test_core_numbers_match_peeling_reference(spark):
    rng = random.Random(17)
    nodes = list(range(24))
    edges = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(80)}
    )
    df = spark.createDataFrame(edges, "a long, b long")
    est, rounds, converged = core_numbers(df, max_rounds=32)
    got = {r["node"]: r["core"] for r in est.collect()}
    want = _py_core_numbers(edges)
    assert converged and got == want
    # capped variant: exact truncation at the cap, never slower
    cap = 3
    est_c, rounds_c, conv_c = core_numbers(df, cap=cap, max_rounds=32)
    got_c = {r["node"]: r["core"] for r in est_c.collect()}
    assert conv_c and got_c == {v: min(c, cap) for v, c in want.items()}
    assert rounds_c <= rounds


def test_key_skew_census_matches_counter(spark):
    rng = random.Random(2)
    vals = [rng.choice(["a", "a", "a", "b", "c", None]) for _ in range(300)]
    df = spark.createDataFrame([(v,) for v in vals], "k string")
    r = key_skew_census(df, "k", "t.k").collect()[0]
    c = collections.Counter("" if v is None else v for v in vals)
    top, cnt = min(((-n, k) for k, n in c.items()))[1], max(c.values())
    assert (r["key"], r["n_rows"], r["n_keys"]) == ("t.k", 300, len(c))
    assert (r["max_cnt"], r["top_key"]) == (cnt, top)
    assert r["skew_micro"] == (1_000_000 * cnt * len(c) + 150) // 300


def test_grouped_linreg_matches_python_exact(spark):
    """Per-group simple linear regression in exact integer
    arithmetic: slope_ppm must equal the Python int reference
    (truncation toward zero — Spark div semantics) including a
    NEGATIVE-slope group, and zero-variance / single-row groups get
    NULL slope."""
    from umn_eda_kafka_stream_processing_spark.operators.linalg import (
        grouped_linreg,
    )

    rng = random.Random(29)
    rows = []
    for i in range(300):  # g=up: y ~ 3x + noise
        x = rng.randrange(1, 1_000_000)
        rows.append(("up", x, 3 * x + rng.randrange(-1000, 1000)))
    for i in range(300):  # g=down: negative covariance
        x = rng.randrange(1, 1_000_000)
        rows.append(("down", x, -2 * x + rng.randrange(-1000, 1000)))
    rows += [("flat", 7, 10), ("flat", 7, 99)]  # zero x-variance
    rows += [("one", 5, 5)]  # single row
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {
        r["g"]: (r["n"], r["slope_ppm"], r["x_mean_micro"], r["y_mean_micro"])
        for r in grouped_linreg(df, "g", "x", "y").collect()
    }

    def tdiv(a, b):  # truncation toward zero, both engines' div
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    by_g = collections.defaultdict(list)
    for g, x, y in rows:
        by_g[g].append((x, y))
    for g, pts in by_g.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        var = n * sxx - sx * sx
        slope = tdiv(1_000_000 * (n * sxy - sx * sy), var) if var else None
        # means use the same div (truncation toward zero): half-up
        # for non-negative sums, half-toward-zero for negative ones
        want = (n, slope, tdiv(sx + n // 2, n), tdiv(sy + n // 2, n))
        assert got[g] == want, (g, got[g], want)
    assert got["down"][1] < 0 < got["up"][1]
    assert got["flat"][1] is None and got["one"][1] is None
