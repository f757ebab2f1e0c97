"""Query catalog: every operator family from SURVEY.md §2 expressed
over the driver's synthetic tables, each paired with a DuckDB oracle.

Each entry is (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql) with
IDENTICAL output column names and value normalization on both sides:

* money/quantity sums go through DECIMAL(18,2) so both engines
  aggregate exactly (float summation order is engine/parallelism
  dependent; decimal is associative) and cast back to DOUBLE;
* arbitrary-double sums/similarities are rounded (4-6 dp) after a
  double-precision reduction on both sides;
* rank/count integers are cast to BIGINT (Spark row_number is int,
  DuckDB's is bigint);
* timestamps are TIMESTAMP_NTZ on both sides (pyspark >= 4.1 reads
  the NANOS parquet as NTZ, µs-lossless here — sources/parquet.py);
  outputs render them as formatted strings so hashing is dtype-free.

The Spark side intentionally routes through the engine's operator
library (operators/, functions/, pipelines/) — these catalog entries
are the engine's public face, and the plans they produce are the
ones bench.py measures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.plans.registry import REGISTRY, QuerySpec, register as _register

from umn_eda_kafka_stream_processing_spark.functions.scalar import composite_key, remaining_percentage, round_half_up
from umn_eda_kafka_stream_processing_spark.operators.core import branch, grouped_count, grouped_topk, latest_by_key, merge
from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table


def _dec(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


def _money_sum(expr: Column, alias: str) -> Column:
    return F.round(F.sum(expr), 2).cast("double").alias(alias)


# ---------------------------------------------------------------------------
# Reference-pipeline family (SURVEY.md §2) over the synthetic star schema
# ---------------------------------------------------------------------------

@_register(
    "user_event_count",
    "Count per key (A7) — reference exercises/stateful/CustomerStreamCount.java:14-16; "
    "events stream grouped by user.",
    "SELECT user_id, count(*) AS event_count FROM events GROUP BY user_id",
)
def user_event_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return grouped_count(events, "user_id", "event_count")


@_register(
    "latest_event_by_user",
    "KTable latest-by-key (S2) — reference builder.table(...) last-write-wins, "
    "samples/PurchaseEventTicket.java:44-51; latest event per user by (ts, event_id).",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """,
)
def latest_event_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # the engine's KTable operator: single hash-agg (map-side
    # combined) rather than window+sort — shuffle volume is |users|,
    # not |events|, the 100 TB-safe shape.
    latest = latest_by_key(
        events.select("user_id", "event_id", "event_type", "value", "ts"),
        "user_id",
        F.struct("ts", "event_id"),
    )
    return latest.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@_register(
    "top_event_types_per_user",
    "Grouped top-k (A1/A2) — reference samples/TopCustomerArtists.java:58-90 "
    "(top-3 artists per customer); tie-break count DESC, type ASC.",
    """
    SELECT user_id, event_type, type_count, rank FROM (
      SELECT user_id, event_type, type_count,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY type_count DESC, event_type ASC) AS rank
      FROM (SELECT user_id, event_type, count(*) AS type_count
            FROM events GROUP BY user_id, event_type)
    ) WHERE rank <= 3
    """,
)
def top_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = grouped_count(events, ["user_id", "event_type"], "type_count")
    topk = grouped_topk(
        counts, ["user_id"],
        [F.col("type_count").desc(), F.col("event_type").asc()], 3,
    )
    return topk.withColumn("rank", F.col("rank").cast("long"))


@_register(
    "brand_line_count",
    "Stream-table join + count (A8) — reference exercises/stateful/"
    "ArtistTicketCount.java:9-11 (tickets ⋈ events → count per artist); "
    "lineitem ⋈ part(dim, broadcast) → count per brand.",
    """
    SELECT p_brand, count(*) AS line_count
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def brand_line_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = lineitem.join(F.broadcast(part), "l_partkey", "inner")
    return grouped_count(joined, "p_brand", "line_count")


@_register(
    "segment_filter_merge",
    "Filter + merge (P4/U1) — reference exercises/stateless/TargetCustomerFilter"
    ".java:13-18 (merge legacy customers, keep a cohort); two segment streams "
    "merged, balance-band filter.",
    """
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM (
      SELECT * FROM customer WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT * FROM customer WHERE c_mktsegment = 'MACHINERY'
    ) WHERE c_acctbal BETWEEN 0 AND 5000
    """,
)
def segment_filter_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING")
    b = customer.filter(F.col("c_mktsegment") == "MACHINERY")
    return merge(a, b).filter(F.col("c_acctbal").between(0, 5000)).select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )


@_register(
    "customer_stringify",
    "Projection + format-string + rekey (P5) — reference exercises/stateless/"
    "AddressSortAndStringify.java:15-20; customer ⋈ nation ⋈ region stringified, "
    "keyed by nation.",
    """
    SELECT n_name AS key,
           c_name || ', ' || n_name || ', ' || r_name || ' (' || c_mktsegment || ')' AS value,
           c_custkey
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    """,
)
def customer_stringify(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.select(
        F.col("n_name").alias("key"),
        F.format_string(
            "%s, %s, %s (%s)",
            F.col("c_name"), F.col("n_name"), F.col("r_name"), F.col("c_mktsegment"),
        ).alias("value"),
        "c_custkey",
    )


@_register(
    "event_value_branch",
    "Split-by-predicate routing (U2/P6) — reference samples/PurchaseEventTicket"
    ".java:97-158 3-way branch; events routed low/mid/high by value, counted "
    "per branch and type.",
    """
    SELECT branch, event_type, count(*) AS n FROM (
      SELECT CASE WHEN value < 25 THEN 'low'
                  WHEN value < 75 THEN 'mid'
                  ELSE 'high' END AS branch, event_type
      FROM events
    ) GROUP BY branch, event_type
    """,
)
def event_value_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    low, mid, high = branch(
        events, F.col("value") < 25, F.col("value") < 75, F.lit(True)
    )
    labeled = merge(
        low.withColumn("branch", F.lit("low")),
        mid.withColumn("branch", F.lit("mid")),
        high.withColumn("branch", F.lit("high")),
    )
    return grouped_count(labeled, ["branch", "event_type"], "n")


@_register(
    "priority_by_nation_matrix",
    "3-way enrichment + composite-key count (J2/J3/A4/P2) — reference phase3/"
    "TopStreamingArtistByState.java:100-238 (streams ⋈ artists ⋈ customers ⋈ "
    "addresses → count per artist-state); orders ⋈ customer ⋈ nation → count "
    "per priority-nation composite key.",
    """
    SELECT n_name || '-' || o_orderpriority AS key,
           n_name, o_orderpriority, count(*) AS order_count
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, o_orderpriority
    """,
)
def priority_by_nation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    enriched = orders.join(F.broadcast(customer), "o_custkey", "inner").join(
        F.broadcast(nation), "c_nationkey", "inner"
    )
    counted = grouped_count(enriched, ["n_name", "o_orderpriority"], "order_count")
    return counted.select(
        composite_key("n_name", "o_orderpriority").alias("key"),
        "n_name", "o_orderpriority", "order_count",
    )


@_register(
    "out_of_nation_sales",
    "4-hop join chain + theta-filter count (J4/J5/J6/A5) — reference phase3/"
    "OutOfStateSales.java:76-161 (count tickets where customer state != venue "
    "state); count lineitems where customer nation != supplier nation, per "
    "supplier.",
    """
    SELECT s_name, count(*) AS out_count
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey  = c_custkey
                  JOIN supplier ON l_suppkey  = s_suppkey
    WHERE c_nationkey <> s_nationkey
    GROUP BY s_name
    """,
)
def out_of_nation_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name", "s_nationkey"
    )
    enriched = (
        lineitem.join(orders, "l_orderkey", "inner")
        .join(F.broadcast(customer), "o_custkey", "inner")
        .join(F.broadcast(supplier), "l_suppkey", "inner")
    )
    out = enriched.filter(F.col("c_nationkey") != F.col("s_nationkey"))
    return grouped_count(out, "s_name", "out_count")


@_register(
    "top_parttype_by_supplier",
    "2-hop join + grouped top-k (J7/A6) — reference phase3/TopSellingGenreByVenue"
    ".java:60-177 (top-3 genres per venue); top-3 part types per supplier.",
    """
    SELECT s_name, p_type, type_count, rank FROM (
      SELECT s_name, p_type, type_count,
             row_number() OVER (PARTITION BY s_name
                                ORDER BY type_count DESC, p_type ASC) AS rank
      FROM (SELECT s_name, p_type, count(*) AS type_count
            FROM lineitem JOIN part     ON l_partkey = p_partkey
                          JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_name, p_type)
    ) WHERE rank <= 3
    """,
)
def top_parttype_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = lineitem.join(F.broadcast(part), "l_partkey").join(
        F.broadcast(supplier), "l_suppkey"
    )
    counts = grouped_count(joined, ["s_name", "p_type"], "type_count")
    topk = grouped_topk(
        counts, ["s_name"], [F.col("type_count").desc(), F.col("p_type").asc()], 3
    )
    return topk.withColumn("rank", F.col("rank").cast("long"))


@_register(
    "order_capacity_confirmation",
    "Stream-table join + running capacity decrement + 3-way branch (J1/A3/P6) — "
    "reference samples/PurchaseEventTicket.java:42-158: each request decrements "
    "remaining; remaining>=0 after decrement → CONFIRMED (:206-208), <0 → "
    "REJECTED; branch sold-out / limited(<=20%) / available. Capacity 5 per "
    "order, requests = lineitems in l_linenumber arrival order.",
    """
    SELECT l_orderkey, l_linenumber, total_requested,
           CAST(5 - total_requested AS DOUBLE) AS remaining_tickets,
           CASE WHEN 5 - total_requested < 0 THEN 'REJECTED'
                ELSE 'CONFIRMED' END AS confirmation_status,
           CASE WHEN 5 - total_requested < 0 THEN 'sold-out'
                WHEN (CAST(5 - total_requested AS DOUBLE) / 5) * 100 <= 20.0 THEN 'limited'
                ELSE 'available' END AS branch
    FROM (SELECT l_orderkey, l_linenumber,
                 CAST(row_number() OVER (PARTITION BY l_orderkey
                                         ORDER BY l_linenumber) AS BIGINT)
                   AS total_requested
          FROM lineitem)
    """,
)
def order_capacity_confirmation(spark: SparkSession, sf_dir: str) -> DataFrame:
    capacity = 5
    lineitem = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    out = (
        lineitem.withColumn("total_requested", F.row_number().over(w).cast("long"))
        .withColumn("capacity_lit", F.lit(float(capacity)))
        .withColumn(
            "remaining_tickets",
            (F.lit(capacity) - F.col("total_requested")).cast("double"),
        )
        .withColumn(
            "confirmation_status",
            F.when(F.col("remaining_tickets") < 0, "REJECTED").otherwise("CONFIRMED"),
        )
        .withColumn(
            "branch",
            F.when(F.col("remaining_tickets") < 0, "sold-out")
            .when(
                remaining_percentage("remaining_tickets", "capacity_lit") <= 20.0,
                "limited",
            )
            .otherwise("available"),
        )
    )
    return out.select(
        "l_orderkey", "l_linenumber", "total_requested", "remaining_tickets",
        "confirmation_status", "branch",
    )


# ---------------------------------------------------------------------------
# Aggregation / SQL surface (engine scope beyond reference parity — "free"
# per SURVEY.md §2.4; these are the bench headliners)
# ---------------------------------------------------------------------------

@_register(
    "q1_pricing_summary",
    "TPC-H Q1 pricing summary — full agg surface (sum/avg/count) with exact "
    "decimal aggregation.",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
           floor(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS avg_qty,
           floor(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS avg_price,
           floor(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    qty, price, disc, tax = (_dec(c) for c in
                             ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _money_sum(qty, "sum_qty"),
        _money_sum(price, "sum_base_price"),
        _money_sum(price * (1 - disc), "sum_disc_price"),
        _money_sum(price * (1 - disc) * (1 + tax), "sum_charge"),
        round_half_up(F.sum(qty).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
        round_half_up(F.sum(price).cast("double") / F.count(F.lit(1)), 6).alias("avg_price"),
        round_half_up(F.sum(disc).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_register(
    "q3_shipping_priority",
    "TPC-H Q3 shape (adapted: orders has o_orderpriority, no shippriority) — "
    "top-10 open orders by revenue.",
    """
    SELECT l_orderkey,
           CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").alias("o_custkey"))
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("date")
    ).select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey", "o_orderdate",
             "o_orderpriority")
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("date")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = lineitem.join(orders, "l_orderkey", "inner").join(
        F.broadcast(customer), "o_custkey", "inner"
    )
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        _money_sum(price * (1 - disc), "revenue")
    )
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@_register(
    "q5_local_supplier_volume",
    "TPC-H Q5 — 6-table join, revenue where customer and supplier share a "
    "nation, per nation in one region.",
    """
    SELECT n_name,
           CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    ).select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    price, disc = _dec("l_extendedprice"), _dec("l_discount")
    return joined.groupBy("n_name").agg(_money_sum(price * (1 - disc), "revenue"))


@_register(
    "hourly_event_type_counts",
    "Tumbling-window aggregation (batch twin of the streaming windowed count; "
    "engine extension — reference has no event-time windows, SURVEY.md §2.8).",
    """
    SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
           count(*) AS n, floor(CAST(SUM(value) AS DOUBLE) * 10000.0 + 0.5) / 10000.0 AS value_sum
    FROM events GROUP BY hour, event_type
    """,
)
def hourly_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # events.ts is TIMESTAMP_NTZ: date_format renders the naive value
    # directly — timezone-free, matching DuckDB's strftime.
    with_hour = events.withColumn(
        "hour", F.date_format("ts", "yyyy-MM-dd HH")
    )
    return with_hour.groupBy("hour", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        round_half_up(F.sum("value"), 4).alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# Set operations beyond merge/union (SURVEY.md §2.5 notes the reference
# has no intersect/except; Spark provides both natively — these prove
# them with oracle twins)
# ---------------------------------------------------------------------------

@_register(
    "repeat_buyer_customers",
    "INTERSECT (distinct set semantics): customers who ordered in BOTH "
    "1996 and 1997. Plans as a distinct-aggregated hash join on the "
    "projected key — set membership, no fact-row fan-out.",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
    """,
)
def repeat_buyer_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def year_keys(y: int):
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("date"))
        ).select("o_custkey")

    return year_keys(1996).intersect(year_keys(1997))


@_register(
    "churned_customers",
    "EXCEPT (distinct set semantics): customers who ordered in 2000 but "
    "never again afterwards — the churn set. Plans as a left-anti "
    "shape over distinct keys.",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= DATE '2000-01-01' AND o_orderdate < DATE '2001-01-01'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= DATE '2001-01-01'
    """,
)
def churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    in_1996 = orders.filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("2001-01-01").cast("date"))
    ).select("o_custkey")
    after = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("date")
    ).select("o_custkey")
    # subtract == SQL EXCEPT (distinct set semantics). NOT exceptAll:
    # bag semantics would keep a customer with two 1996 orders after
    # removing one "later" occurrence — multiplicity arithmetic, not
    # set membership.
    return in_1996.subtract(after)


@_register(
    "urgent_purchase_dom_pairs",
    "Skew-safe fact x fact join via operators/skew.py:salted_join: "
    "purchase events ⋈ 1-URGENT orders on DAY-OF-MONTH (31 distinct "
    "values — without salting at most 31 reducers own the whole join "
    "at any cluster size), per-pair predicate o_totalprice > value*1000 "
    "(non-factorable: the count is NOT a product of per-side "
    "aggregates), pair counts per dom. Left side salted "
    "deterministically, right side replicated to every salt — each "
    "pair meets exactly once (property-tested in "
    "tests/test_skew_and_peek.py). Oracle: the plain join.",
    """
    SELECT dom, CAST(count(*) AS BIGINT) AS n_pairs
    FROM (SELECT CAST(day(ts) AS INT) AS dom, value
          FROM events WHERE event_type = 'purchase') e
    JOIN (SELECT CAST(day(o_orderdate) AS INT) AS dom, o_totalprice
          FROM orders WHERE o_orderpriority = '1-URGENT') o USING (dom)
    WHERE o_totalprice > value * 1000
    GROUP BY dom
    """,
)
def urgent_purchase_dom_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from umn_eda_kafka_stream_processing_spark.operators.skew import salted_join

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.dayofmonth("ts").cast("int").alias("dom"), "value")
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            F.dayofmonth("o_orderdate").cast("int").alias("dom"), "o_totalprice"
        )
    )
    # shuffle_hash pins the at-scale distributed shape: without it AQE
    # broadcasts the small exploded side at test SFs, which would void
    # the salting this query exists to exhibit
    pairs = salted_join(ev, od, "dom", salt_buckets=8, right_hint="shuffle_hash")
    return (
        pairs.filter(F.col("o_totalprice") > F.col("value") * 1000)
        .groupBy("dom")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


@_register(
    "daily_orders_vs_events",
    "FULL OUTER join of two daily activity series (orders per day vs "
    "events per day): days with only one side present survive with a "
    "zero on the other — the reconciliation-report join shape. "
    "COALESCE of the two date keys; counts BIGINT.",
    """
    SELECT coalesce(od, ed) AS day,
           coalesce(n_orders, 0) AS n_orders,
           coalesce(n_events, 0) AS n_events
    FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS od,
                 CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1) o
    FULL OUTER JOIN
         (SELECT strftime(ts, '%Y-%m-%d') AS ed,
                 CAST(count(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1) e
    ON od = ed
    """,
)
def daily_orders_vs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").groupBy(
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    events = load_table(spark, sf_dir, "events").groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("ed")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    # full-outer can never broadcast; hint shuffle-hash so the two
    # pre-aggregated (already hash-partitioned) sides join without
    # sorting either (SMJ would re-sort both just to stream them)
    return orders.join(
        events.hint("shuffle_hash"), orders["od"] == events["ed"], "full_outer"
    ).select(
        F.coalesce("od", "ed").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )
