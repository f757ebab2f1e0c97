"""Temporal-operator queries: as-of join and event-time windows.

Engine extensions beyond the reference (it has no event time at all,
SURVEY.md §2.8) — registered with DuckDB oracles that use a DIFFERENT
algorithm for the same semantics (DuckDB's native ASOF JOIN vs our
union+window; lag/cumsum sessionization vs session_window), which
makes them strong cross-checks.

Timestamps are compared as formatted strings (the hourly_event_type_
counts pattern) to stay clear of engine timestamp-type differences;
events.ts arrives as epoch-nanos (sources/parquet.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.joins import asof_join
from umn_eda_kafka_stream_processing_spark.operators.windows import (
    session_agg,
    sliding_agg,
    ts_from_nanos,
)
from umn_eda_kafka_stream_processing_spark.plans.registry import register as _register
from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@_register(
    "asof_latest_order_per_event",
    "As-of join: each event picks up the user's latest order at or before "
    "the event time (operators/joins.py:asof_join — union+window, one "
    "shuffle). Oracle uses DuckDB's native ASOF JOIN: same semantics, "
    "different algorithm.",
    f"""
    WITH upd AS (
      SELECT o_custkey AS custkey, o_orderdate,
             max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY 1, 2
    ), f AS (
      SELECT user_id AS custkey, event_id, CAST(ts AS TIMESTAMP) AS ets
      FROM events
    )
    SELECT f.event_id, f.custkey,
           strftime(f.ets, '{_TS_FMT_DUCK}') AS event_ts,
           u.o_orderkey,
           strftime(u.o_orderdate, '{_TS_FMT_DUCK}') AS order_date
    FROM f ASOF JOIN upd u
      ON f.custkey = u.custkey AND f.ets >= u.o_orderdate
    """,
)
def asof_latest_order_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    facts = events.select(
        F.col("user_id").alias("custkey"),
        "event_id",
        ts_from_nanos("ts").alias("ets"),
    )
    updates = (
        orders.groupBy(F.col("o_custkey").alias("custkey"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        facts, updates, "custkey", "ets", "o_orderdate",
        ["o_orderkey", "o_orderdate"], how="inner",
    )
    return joined.select(
        "event_id", "custkey",
        F.date_format("ets", _TS_FMT_SPARK).alias("event_ts"),
        "o_orderkey",
        F.date_format("o_orderdate", _TS_FMT_SPARK).alias("order_date"),
    )


@_register(
    "sliding_event_type_counts",
    "Sliding-window counts (1 h window, 30 min slide) per event type "
    "(operators/windows.py:sliding_agg). Oracle expands each event into its "
    "two covering windows via time_bucket arithmetic.",
    """
    WITH b AS (
      SELECT event_type,
             time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS b30
      FROM events
    ), w AS (
      SELECT event_type, b30 AS ws FROM b
      UNION ALL
      SELECT event_type, b30 - INTERVAL '30 minutes' FROM b
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M') AS window_start, event_type,
           CAST(count(*) AS BIGINT) AS count
    FROM w GROUP BY 1, 2
    """,
)
def sliding_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "ets", ts_from_nanos("ts")
    )
    win = sliding_agg(events, "ets", "1 hour", "30 minutes", ["event_type"])
    return win.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm").alias("window_start"),
        "event_type",
        "count",
    )


@_register(
    "session_event_counts",
    "Per-user session windows with a 30 min inactivity gap "
    "(operators/windows.py:session_agg). Oracle sessionizes via "
    "lag + running sum — independent algorithm, same semantics "
    "(session end = last event + gap; an event at exactly gap distance "
    "starts a new session).",
    f"""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ets FROM events),
    m AS (
      SELECT user_id, ets,
             CASE WHEN lag(ets) OVER (PARTITION BY user_id ORDER BY ets) IS NULL
                    OR ets - lag(ets) OVER (PARTITION BY user_id ORDER BY ets)
                       >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ), s AS (
      SELECT user_id, ets,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ets
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM m
    )
    SELECT user_id,
           strftime(min(ets), '{_TS_FMT_DUCK}') AS session_start,
           strftime(max(ets) + INTERVAL '30 minutes', '{_TS_FMT_DUCK}') AS session_end,
           CAST(count(*) AS BIGINT) AS count
    FROM s GROUP BY user_id, sid
    """,
)
def session_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "ets", ts_from_nanos("ts")
    )
    win = session_agg(events, "ets", "30 minutes", ["user_id"])
    return win.select(
        "user_id",
        F.date_format("session_start", _TS_FMT_SPARK).alias("session_start"),
        F.date_format("session_end", _TS_FMT_SPARK).alias("session_end"),
        "count",
    )
