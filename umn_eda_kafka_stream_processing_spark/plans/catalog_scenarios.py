"""Scenario-catalog queries over the synthetic star schema.

The reference readme asks workshop attendees to build a catalog of
scenarios beyond the shipped samples (reference: readme.md:150-208 —
most-streamed artists, sold-out alerts, must-see venue, suggested
events, global totals, location rollups). pipelines/scenarios.py
implements them over the Utopia entities; this module registers their
star-schema twins so the driver's DuckDB gate checks them:

| scenario (readme)            | star-schema twin here            |
|------------------------------|----------------------------------|
| top artists across customers | top_event_types_global           |
| customers by top artist      | users_by_top_event_type          |
| global totals                | global_totals                    |
| suggested events by genre    | suggested_events_by_type         |
| must-see venue (customers)   | top_supplier_by_customers        |

(sold-out / near-capacity alerting is already covered by
event_value_branch and order_capacity_confirmation in catalog.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.operators.core import global_topk, grouped_count, grouped_topk
from umn_eda_kafka_stream_processing_spark.plans.registry import register as _register
from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table


@_register(
    "top_event_types_global",
    "Top-3 event types across all users (pipelines/scenarios.py:"
    "top_artists_global; reference readme.md MOST STREAMED ARTISTS goal 2).",
    """
    SELECT event_type, CAST(count(*) AS BIGINT) AS count,
           CAST(row_number() OVER (ORDER BY count(*) DESC, event_type ASC) AS BIGINT) AS rank
    FROM events GROUP BY event_type
    QUALIFY rank <= 3
    """,
)
def top_event_types_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = grouped_count(events, "event_type")
    return global_topk(counts, [("count", False), ("event_type", True)], 3)


@_register(
    "users_by_top_event_type",
    "Group users sharing the same top event type (pipelines/scenarios.py:"
    "customers_by_top_artist; reference readme.md MOST STREAMED ARTISTS bonus).",
    """
    WITH per_user AS (
      SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
    ), top1 AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
      FROM per_user
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(user_id) AS BIGINT) AS min_user_id,
           CAST(max(user_id) AS BIGINT) AS max_user_id
    FROM top1 WHERE rn = 1 GROUP BY event_type
    """,
)
def users_by_top_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = grouped_count(events, ["user_id", "event_type"])
    top1 = grouped_topk(
        counts, ["user_id"], [F.col("count").desc(), F.col("event_type").asc()], 1
    )
    return top1.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("user_id").alias("min_user_id"),
        F.max("user_id").alias("max_user_id"),
    )


_TOTAL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@_register(
    "global_totals",
    "Record count per table — distributed partial+final count, one row per "
    "entity (pipelines/scenarios.py:global_totals; reference readme.md "
    "GLOBAL TOTALS: the Kafka Streams version must merge per-task totals; "
    "Spark's two-stage aggregate does this natively).",
    "\nUNION ALL\n".join(
        f"SELECT '{t}' AS entity, CAST(count(*) AS BIGINT) AS total FROM {t}"
        for t in _TOTAL_TABLES
    ),
)
def global_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = [
        load_table(spark, sf_dir, t)
        .agg(F.count(F.lit(1)).alias("total"))
        .select(F.lit(t).alias("entity"), "total")
        for t in _TOTAL_TABLES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@_register(
    "suggested_events_by_type",
    "Suggest to each user the 5 most recent events of the user's most-"
    "frequent event type (pipelines/scenarios.py:suggested_events_by_genre; "
    "reference readme.md SUGGESTED EVENTS - GENRE). Type-keyed join: the "
    "per-type top-5 dim broadcasts; the per-user top-type side stays "
    "fact-sized.",
    """
    WITH per_user AS (
      SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
    ), top_type AS (
      SELECT user_id, event_type FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type ASC) AS rn
        FROM per_user) WHERE rn = 1
    ), recent AS (
      SELECT event_type, event_id FROM (
        SELECT event_type, event_id,
               row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id ASC) AS rn
        FROM events) WHERE rn <= 5
    )
    SELECT t.user_id, t.event_type, r.event_id
    FROM top_type t JOIN recent r ON t.event_type = r.event_type
    """,
)
def suggested_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = grouped_count(events, ["user_id", "event_type"])
    top_type = grouped_topk(
        counts, ["user_id"], [F.col("count").desc(), F.col("event_type").asc()], 1
    ).select("user_id", "event_type")
    recent = grouped_topk(
        events.select("event_type", "event_id", "ts"),
        ["event_type"],
        [F.col("ts").desc(), F.col("event_id").asc()],
        5,
    ).select("event_type", "event_id")
    return top_type.join(F.broadcast(recent), "event_type", "inner").select(
        "user_id", "event_type", "event_id"
    )


@_register(
    "top_supplier_by_customers",
    "Suppliers serving the most distinct customers, top-5 "
    "(pipelines/scenarios.py:must_see_venue_by_customers; reference "
    "readme.md MUST SEE VENUE goal 2: venue hosting the most customers).",
    """
    WITH per_supp AS (
      SELECT l.l_suppkey, count(DISTINCT o.o_custkey) AS n_customers
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_suppkey
    )
    SELECT l_suppkey, CAST(n_customers AS BIGINT) AS n_customers,
           CAST(row_number() OVER (ORDER BY n_customers DESC, l_suppkey ASC) AS BIGINT) AS rank
    FROM per_supp QUALIFY rank <= 5
    """,
)
def top_supplier_by_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_supp = (
        lineitem.select("l_suppkey", "l_orderkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "inner")
        .groupBy("l_suppkey")
        .agg(F.count_distinct("o_custkey").alias("n_customers"))
    )
    return global_topk(per_supp, [("n_customers", False), ("l_suppkey", True)], 5)
