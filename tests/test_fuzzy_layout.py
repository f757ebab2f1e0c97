"""Unit tests for the blocked fuzzy join (operators/joins.py),
Z-order interleave (operators/compaction.py:zorder_expr), and the
weekly-retention cohort shape."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.compaction import zorder_expr
from umn_eda_kafka_stream_processing_spark.operators.joins import (
    best_fuzzy_match,
    fuzzy_join,
)


def test_fuzzy_join_distances_and_blocking(spark):
    dirty = spark.createDataFrame(
        [(1, "cold widgt"), (2, "blue rod"), (3, "xold widget")],
        "id long, dn string",
    )
    clean = spark.createDataFrame(
        [("cold widget",), ("blue rod",), ("cold rod",)], "cn string"
    )
    got = {
        (r["id"], r["cn"]): r["dist"]
        for r in fuzzy_join(dirty, clean, "dn", "cn", max_dist=1).collect()
    }
    assert got[(1, "cold widget")] == 1
    assert got[(2, "blue rod")] == 0
    # id 3's typo changed the first char -> escapes the 'c' block:
    # the documented recall loss of first-char blocking
    assert not any(k[0] == 3 for k in got)
    # 'cold rod' is dist 4 from 'cold widgt' -> filtered
    assert (1, "cold rod") not in got


def test_fuzzy_join_salted_equals_unsalted_degenerate_block(spark):
    """Property: under a DEGENERATE block (every row keyed alike — the
    worst-case skew), salting must (a) return exactly the unsalted
    result — each pair meets once, recall unchanged — and (b) spread
    the block's left rows across salt buckets so no task owns the
    whole block² (bounded per-task pair counts)."""
    rng = random.Random(7)
    vocab = [f"name{i:03d}" for i in range(40)]
    dirty_rows = [
        (i, rng.choice(vocab) + ("x" if i % 3 == 0 else ""))
        for i in range(240)
    ]
    dirty = spark.createDataFrame(dirty_rows, "id long, dn string")
    clean = spark.createDataFrame([(v,) for v in vocab], "cn string")

    def degenerate(_c):
        return F.lit("ALL")

    salt = 8
    unsalted = {
        (r["id"], r["cn"], r["dist"])
        for r in fuzzy_join(
            dirty, clean, "dn", "cn", max_dist=1,
            block=degenerate, salt_buckets=1,
        ).collect()
    }
    salted = [
        (r["id"], r["cn"], r["dist"])
        for r in fuzzy_join(
            dirty, clean, "dn", "cn", max_dist=1,
            block=degenerate, salt_buckets=salt,
        ).collect()
    ]
    assert len(salted) == len(set(salted)), "a pair met more than once"
    assert set(salted) == unsalted
    # per-(block, salt) left-row counts are balanced: with 240 rows
    # over 8 salts the heaviest bucket must stay well under the whole
    # block (each task's pair work = bucket_rows x |clean|). The salt
    # hashes ONLY the join column (payload columns may be unhashable
    # maps, and payload edits must not move a row's salt), so rows
    # cluster per distinct name — ~80 distinct names spread the block
    # far below one task owning all 240 rows
    per_bucket = (
        dirty.withColumn(
            "_fzs", F.pmod(F.hash(F.col("dn")), F.lit(salt))
        )
        .groupBy("_fzs")
        .count()
        .collect()
    )
    assert len(per_bucket) == salt
    assert max(r["count"] for r in per_bucket) <= 240 // 3


def test_fuzzy_join_salt_tolerates_map_payload(spark):
    """Spark's hash() raises for MapType inputs — the salt must hash
    only the join column so a map-typed payload column on the left
    frame cannot break analysis (round-8 advice)."""
    dirty = spark.createDataFrame(
        [(1, "cold widgt", {"k": "v"})],
        "id long, dn string, attrs map<string,string>",
    )
    clean = spark.createDataFrame([("cold widget",)], "cn string")
    got = fuzzy_join(dirty, clean, "dn", "cn", max_dist=1).collect()
    assert [(r["id"], r["cn"], r["dist"]) for r in got] == [
        (1, "cold widget", 1)
    ]


def test_best_fuzzy_match_argmin_ties(spark):
    m = spark.createDataFrame(
        [(1, "bb", 1), (1, "aa", 1), (1, "zz", 0)],
        "id long, cn string, dist int",
    )
    r = best_fuzzy_match(m, ["id"], "cn").collect()[0]
    assert (r["best_dist"], r["best_cn"]) == (0, "zz")
    # equal dists tie-break to the smaller name
    m2 = spark.createDataFrame(
        [(1, "bb", 1), (1, "aa", 1)], "id long, cn string, dist int"
    )
    r2 = best_fuzzy_match(m2, ["id"], "cn").collect()[0]
    assert (r2["best_dist"], r2["best_cn"]) == (1, "aa")


def _py_morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_zorder_expr_matches_python_bit_interleave(spark):
    rng = random.Random(9)
    rows = [
        (rng.randrange(1024), rng.randrange(1024)) for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", F.expr(zorder_expr("a", "b", 10)).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_morton(r["a"], r["b"], 10)


def test_zorder_locality_beats_linear_on_grid(spark):
    # full 32x32 grid: a centered 8x8 range touches fewer z-blocks
    # than row-major blocks of the same size
    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, "a long, b long")
    z = df.select(
        "a",
        "b",
        F.expr(f"{zorder_expr('a', 'b', 5)} div 32").alias("zb"),
        F.expr("(a * 32 + b) div 32").alias("lb"),
    ).where((F.col("a") >= 12) & (F.col("a") < 20)
            & (F.col("b") >= 12) & (F.col("b") < 20))
    got = z.agg(
        F.countDistinct("zb").alias("nz"), F.countDistinct("lb").alias("nl")
    ).collect()[0]
    assert got["nz"] < got["nl"]

def _py_hilbert(order_n, x, y):
    d = 0
    s = order_n // 2
    while s > 0:
        rx = (x // s) % 2
        ry = (y // s) % 2
        d += s * s * (3 * rx + ry - 2 * rx * ry)
        x %= s
        y %= s
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_python_and_is_adjacent(spark):
    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        with_hilbert,
    )

    n = 32  # 5 bits — full grid
    rows = [(a, b) for a in range(n) for b in range(n)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["h"]
        for r in with_hilbert(df, "a", "b", bits=5).collect()
    }
    pos = {}
    for a, b in rows:
        want = _py_hilbert(n, a, b)
        assert got[(a, b)] == want, (a, b)
        pos[want] = (a, b)
    # bijective and every consecutive index is grid-adjacent — the
    # defining Hilbert property (Z-order jumps at power-of-two seams)
    assert len(pos) == n * n
    assert all(
        abs(pos[d][0] - pos[d + 1][0]) + abs(pos[d][1] - pos[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


def test_hilbert_locality_at_least_zorder_on_grid(spark):
    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        with_hilbert,
        zorder_expr,
    )

    rows = [(a, b) for a in range(32) for b in range(32)]
    df = with_hilbert(
        spark.createDataFrame(rows, "a long, b long"), "a", "b", bits=5
    )
    z = df.select(
        "a",
        "b",
        F.expr(f"{zorder_expr('a', 'b', 5)} div 32").alias("zb"),
        F.expr("h div 32").alias("hb"),
    ).where((F.col("a") >= 12) & (F.col("a") < 20)
            & (F.col("b") >= 12) & (F.col("b") < 20))
    got = z.agg(
        F.countDistinct("zb").alias("nz"), F.countDistinct("hb").alias("nh")
    ).collect()[0]
    assert got["nh"] <= got["nz"]


def _py_skilling(coords, bits):
    # transcription of Skilling's AxesToTranspose + bit interleave
    # (AIP Conf. Proc. 707, 2004) — the public n-D Hilbert algorithm
    X = list(coords)
    n = len(X)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if X[i] & q:
                X[0] ^= p
            else:
                t = (X[0] ^ X[i]) & p
                X[0] ^= t
                X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    q = 1 << (bits - 1)
    while q > 1:
        if X[n - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(n):
        X[i] ^= t
    d = 0
    for j in range(bits):
        for i in range(n):
            d |= ((X[i] >> j) & 1) << (j * n + (n - 1 - i))
    return d


def test_hilbert_nd_matches_python_bijective_adjacent(spark):
    from itertools import product

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        with_hilbert_nd,
    )

    for n, bits in [(3, 3), (4, 2)]:
        side = 1 << bits
        cols = [f"c{i}" for i in range(n)]
        rows = list(product(range(side), repeat=n))
        df = spark.createDataFrame(
            rows, ", ".join(f"{c} long" for c in cols)
        )
        got = {
            tuple(r[c] for c in cols): r["h"]
            for r in with_hilbert_nd(df, cols, bits=bits).collect()
        }
        pos = {}
        for coords in rows:
            want = _py_skilling(coords, bits)
            assert got[coords] == want, (n, bits, coords)
            pos[want] = coords
        total = side**n
        assert len(pos) == total and min(pos) == 0 and max(pos) == total - 1
        # defining Hilbert property in any dimension: consecutive
        # indexes are grid-adjacent (exactly one coordinate, by 1)
        for d in range(total - 1):
            diff = sum(abs(a - b) for a, b in zip(pos[d], pos[d + 1]))
            assert diff == 1, (n, bits, d)


def test_hilbert_nd_duckdb_text_matches_spark():
    """Cross-engine drift guard at the generator level: the DuckDB
    step text (div='//', xor()) chained as CTEs must produce the
    same index as the Python reference on a 3-D grid."""
    import duckdb

    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        duck_xor,
        hilbert_nd_exprs,
    )

    n, bits = 3, 3
    steps, idx = hilbert_nd_exprs(n, bits, div="//", xor=duck_xor)
    cols = [f"_g{i}" for i in range(n)]
    ctes = [
        "s0 AS (SELECT a.r AS c0, b.r AS c1, c.r AS c2, "
        "a.r AS _g0, b.r AS _g1, c.r AS _g2 "
        f"FROM range({1 << bits}) a(r), range({1 << bits}) b(r), "
        f"range({1 << bits}) c(r))"
    ]
    for k, step in enumerate(steps, start=1):
        sets = ", ".join(
            f"{e} AS {c}" for c, e in step.items()
        )
        keep = ", ".join(
            ["c0", "c1", "c2"]
            + [c for c in cols if c not in step]
        )
        ctes.append(f"s{k} AS (SELECT {keep}, {sets} FROM s{k - 1})")
    sql = (
        "WITH " + ",\n".join(ctes)
        + f" SELECT c0, c1, c2, {idx} AS h FROM s{len(steps)}"
    )
    for c0, c1, c2, h in duckdb.sql(sql).fetchall():
        assert h == _py_skilling((c0, c1, c2), bits), (c0, c1, c2)


def test_zorder_nd_expr_matches_python(spark):
    from umn_eda_kafka_stream_processing_spark.operators.compaction import (
        zorder_nd_expr,
    )

    rng = random.Random(17)
    rows = [
        (rng.randrange(16), rng.randrange(16), rng.randrange(16))
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = df.select(
        "a", "b", "c",
        F.expr(zorder_nd_expr(["a", "b", "c"], 4)).alias("z"),
    ).collect()

    def morton3(a, b, c, bits):
        z = 0
        for j in range(bits):
            z |= ((a >> j) & 1) << (3 * j + 2)
            z |= ((b >> j) & 1) << (3 * j + 1)
            z |= ((c >> j) & 1) << (3 * j)
        return z

    for r in got:
        assert r["z"] == morton3(r["a"], r["b"], r["c"], 4)
