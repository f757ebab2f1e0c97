"""Unit tests for temporal operators: as-of join, interval join,
event-time windows (operators/joins.py, operators/windows.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.joins import asof_join, interval_join
from umn_eda_kafka_stream_processing_spark.operators.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    facts = spark.createDataFrame(
        [("k1", _ts("2024-01-01T10:00:00"), "f1"),
         ("k1", _ts("2024-01-01T12:00:00"), "f2"),
         ("k1", _ts("2024-01-01T09:00:00"), "f0"),   # before any update
         ("k2", _ts("2024-01-01T12:00:00"), "f3")],
        "k string, t timestamp, fact_id string",
    )
    updates = spark.createDataFrame(
        [("k1", _ts("2024-01-01T10:00:00"), "u-a"),   # == f1's time → inclusive
         ("k1", _ts("2024-01-01T11:30:00"), "u-b"),
         ("k2", _ts("2024-01-01T11:00:00"), "u-c")],
        "k string, ut timestamp, val string",
    )
    got = {r["fact_id"]: r["val"]
           for r in asof_join(facts, updates, "k", "t", "ut", ["val"]).collect()}
    assert got == {"f1": "u-a", "f2": "u-b", "f3": "u-c"}  # f0 dropped (inner)

    left = asof_join(facts, updates, "k", "t", "ut", ["val"], how="left")
    got_left = {r["fact_id"]: r["val"] for r in left.collect()}
    assert got_left["f0"] is None and len(got_left) == 4


def test_asof_join_forward_and_tolerance(spark):
    """direction='forward' picks the EARLIEST update at-or-after the
    fact; tolerance bounds the gap in both directions (too-old /
    too-far matches become no-match: dropped inner, NULL left)."""
    facts = spark.createDataFrame(
        [("k1", _ts("2024-01-01T10:00:00"), "f1"),
         ("k1", _ts("2024-01-01T12:00:00"), "f2"),
         ("k1", _ts("2024-01-01T23:00:00"), "f3")],  # no update within 2h
        "k string, t timestamp, fact_id string",
    )
    updates = spark.createDataFrame(
        [("k1", _ts("2024-01-01T10:00:00"), "u-a"),   # == f1 → inclusive
         ("k1", _ts("2024-01-01T13:30:00"), "u-b")],
        "k string, ut timestamp, val string",
    )
    fwd = {
        r["fact_id"]: r["val"]
        for r in asof_join(
            facts, updates, "k", "t", "ut", ["val"], direction="forward"
        ).collect()
    }
    # f1 matches u-a (inclusive at equal time), f2 looks forward to
    # u-b, f3 has nothing after it -> dropped (inner)
    assert fwd == {"f1": "u-a", "f2": "u-b"}
    tol = {
        r["fact_id"]: r["val"]
        for r in asof_join(
            facts, updates, "k", "t", "ut", ["val"],
            direction="forward", tolerance="1 hour", how="left",
        ).collect()
    }
    # u-b is 1.5h after f2 -> outside the 1h tolerance -> NULL
    assert tol == {"f1": "u-a", "f2": None, "f3": None}
    back_tol = {
        r["fact_id"]: r["val"]
        for r in asof_join(
            facts, updates, "k", "t", "ut", ["val"], tolerance="2 hours"
        ).collect()
    }
    # backward: f2's latest prior update is u-a (exactly 2h — the
    # bound is inclusive); f3's latest prior u-b is 9.5h stale -> dropped
    assert back_tol == {"f1": "u-a", "f2": "u-a"}


def test_interval_join(spark):
    facts = spark.createDataFrame(
        [("k1", 5, "a"), ("k1", 10, "b"), ("k1", 15, "c"), ("k2", 5, "d")],
        "k string, t long, fid string",
    )
    ivals = spark.createDataFrame(
        [("k1", 0, 10, "early"), ("k1", 10, 20, "late")],
        "k string, s long, e long, label string",
    )
    got = {(r["fid"], r["label"])
           for r in interval_join(facts, ivals, "k", "t", "s", "e").collect()}
    # right-open: t=10 falls in [10,20), not [0,10); k2 has no interval
    assert got == {("a", "early"), ("b", "late"), ("c", "late")}


def test_tumbling_and_sliding_windows(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01T10:05:00"), "x"), (_ts("2024-01-01T10:20:00"), "x"),
         (_ts("2024-01-01T10:40:00"), "x")],
        "t timestamp, g string",
    )
    tum = {(r["window_start"].minute, r["count"])
           for r in tumbling_agg(df, "t", "30 minutes", ["g"]).collect()}
    assert tum == {(0, 2), (30, 1)}
    # 30m window sliding 15m: each event in 2 windows
    sli = sliding_agg(df, "t", "30 minutes", "15 minutes", ["g"])
    assert sum(r["count"] for r in sli.collect()) == 6


def test_session_windows_gap_semantics(spark):
    df = spark.createDataFrame(
        [(_ts("2024-01-01T10:00:00"), "u"),
         (_ts("2024-01-01T10:10:00"), "u"),    # within 30m → same session
         (_ts("2024-01-01T11:00:00"), "u")],   # 50m gap → new session
        "t timestamp, g string",
    )
    rows = sorted(
        session_agg(df, "t", "30 minutes", ["g"]).collect(),
        key=lambda r: r["session_start"],
    )
    assert [r["count"] for r in rows] == [2, 1]
    assert rows[0]["session_end"] == _ts("2024-01-01T10:40:00")  # last + gap


def test_activity_similarity_lsh_recall_vs_exact(spark):
    """The SRP-LSH scale twin of user_activity_similarity: every pair
    it emits is a true >=0.8-cosine pair (the exact-cosine verify makes
    precision 1.0), and it recovers a healthy fraction of the exact
    quadratic pair set (4 bands x 6 bits => theoretical recall ~0.7 at
    sim 0.8; observed 128/175 at sf0.01)."""
    from umn_eda_kafka_stream_processing_spark.operators import similarity as sim
    from umn_eda_kafka_stream_processing_spark.plans.catalog_windows import (
        _circadian_profiles,
        user_activity_similarity_lsh,
    )

    sf = "/root/testdata/sf0.01"
    prof = _circadian_profiles(spark, sf)
    exact = {
        (r["user_id_a"], r["user_id_b"])
        for r in sim.embedding_near_dup_pairs(
            prof, threshold=0.8, id_col="user_id", vec_col="vec",
            block_col=None,
        ).collect()
    }
    lsh = {
        (r["user_id_a"], r["user_id_b"])
        for r in user_activity_similarity_lsh(spark, sf).collect()
    }
    assert lsh, "LSH path found no pairs at sf0.01"
    assert lsh <= exact            # exact-cosine verify => no false pairs
    recall = len(lsh) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f} below bound"


def test_scd2_intervals_asof_probe_and_ties(spark):
    """SCD2 materialization: contiguous [valid_from, valid_to)
    versions per key, is_current on the last, same-timestamp ties
    ordered by the sequence column, and the as-of probe returns
    exactly one version per (key, T)."""
    from umn_eda_kafka_stream_processing_spark.operators.windows import (
        scd2_intervals,
    )
    import pyspark.sql.functions as F

    rows = [
        (1, 10, "2024-01-01 00:00:00", "a"),
        (1, 11, "2024-01-02 00:00:00", "b"),
        (1, 12, "2024-01-02 00:00:00", "c"),  # tie: event_id orders
        (2, 20, "2024-01-05 00:00:00", "x"),
    ]
    df = spark.createDataFrame(
        rows, "k long, seq long, ts string, state string"
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    scd = scd2_intervals(df, "k", "ts", ["seq"]).collect()
    by_seq = {r["seq"]: r for r in scd}
    assert by_seq[10]["valid_to"] == by_seq[11]["valid_from"]
    # tie resolution: b (seq 11) closes at c's identical timestamp
    assert by_seq[11]["valid_to"] == by_seq[12]["valid_from"]
    assert not by_seq[11]["is_current"] and by_seq[12]["is_current"]
    assert by_seq[20]["is_current"] and by_seq[20]["valid_to"] is None

    # as-of probe at T: exactly one matching version per key
    scd_df = scd2_intervals(df, "k", "ts", ["seq"])
    probe = scd_df.filter(
        (F.col("valid_from") <= F.lit("2024-01-03").cast("timestamp_ntz"))
        & (
            F.col("valid_to").isNull()
            | (F.lit("2024-01-03").cast("timestamp_ntz") < F.col("valid_to"))
        )
    ).collect()
    assert {(r["k"], r["state"]) for r in probe} == {(1, "c")}
