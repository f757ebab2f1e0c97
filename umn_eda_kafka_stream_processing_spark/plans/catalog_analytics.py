"""Analytics-surface queries: subword tokenization, rolling-hash
fingerprints, exact percentiles, rollup grouping sets.

Rounds out the engine surface beyond the reference (which has only
counts — SURVEY.md §2.4) with the aggregate families Spark gives for
free, each pinned by a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.functions.scalar import round_half_up
from umn_eda_kafka_stream_processing_spark.plans.registry import register as _register
from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table, spread

# GPT-2-style pre-tokenizer classes, RE2/Java-regex-portable subset:
# contraction suffixes, letter runs (Latin + ext, Greek, Cyrillic,
# CJK), digit runs, single non-space-punct chars.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-zÀ-ɏͰ-ϿЀ-ӿ一-鿿]+|[0-9]+|[^A-Za-z0-9\s]"


@_register(
    "bpe_token_stats",
    "Subword-ish token counting: GPT-2-style pre-tokenizer regex (letter "
    "runs incl. Latin-ext/Greek/Cyrillic/CJK, digit runs, contraction "
    "suffixes, punctuation singles) — the BPE pre-segmentation pass, "
    "JVM-side regexp_count; whitespace count for comparison.",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_RE.replace("'", "''")}')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_RE)).cast("long").alias("n_bpe_tokens"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_ws_tokens"),
    )


# polynomial rolling hash: h = fold(codepoints, (h*131 + c) mod (2^31-1)).
# 131 * (2^31-1) + c < 2^38 — no BIGINT overflow; bit-identical in any
# engine with 64-bit integers. greatest(len,1) guards Spark's
# sequence(1, 0) == [1, 0] descending-sequence edge on empty text.
_B, _M = 131, 2**31 - 1
_FOLD = f"(h, c) -> (h * {_B} + c) % {_M}"


@_register(
    "rolling_fingerprints",
    "Document fingerprinting by polynomial rolling hash (Rabin-Karp over "
    "codepoints mod 2^31-1): whole-document hash plus winnowing-style "
    "minimum over 16-char window hashes — pure integer folds, portable.",
    f"""
    WITH cps AS (
      SELECT doc_id,
             list_transform(range(1, greatest(length(text), 1) + 1),
                            i -> CAST(greatest(unicode(substr(text, CAST(i AS INT), 1)), 0) AS BIGINT)) AS cp
      FROM documents
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), cp), {_FOLD}) AS doc_hash,
           CAST(list_min(list_transform(range(1, greatest(len(cp) - 15, 1) + 1),
                i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                                              cp[CAST(i AS INT):CAST(i + 15 AS INT)]),
                                 {_FOLD}))) AS BIGINT) AS winnow_min
    FROM cps
    """,
)
def rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    with_cp = docs.select(
        "doc_id",
        "text",
        F.expr(
            "transform(sequence(1, greatest(length(text), 1)), "
            "i -> bigint(greatest(ascii(substring(text, i, 1)), 0)))"
        ).alias("cp"),
    )
    doc_hash = F.expr(f"aggregate(cp, bigint(0), {_FOLD})")
    winnow = F.expr(
        f"array_min(transform(sequence(1, greatest(size(cp) - 15, 1)), "
        f"i -> aggregate(slice(cp, i, 16), bigint(0), {_FOLD})))"
    )
    return with_cp.select(
        "doc_id",
        doc_hash.alias("doc_hash"),
        winnow.cast("long").alias("winnow_min"),
    )


@_register(
    "value_percentiles_by_type",
    "Exact interpolated percentiles (p50/p95/p99) of event value per type — "
    "Spark percentile == DuckDB quantile_cont semantics; rounded half-up 4dp.",
    """
    SELECT event_type,
           floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
           floor(quantile_cont(value, 0.95) * 10000.0 + 0.5) / 10000.0 AS p95,
           floor(quantile_cont(value, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        round_half_up(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        round_half_up(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        round_half_up(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "orders_rollup",
    "ROLLUP grouping sets over (order priority, order status): per-cell, "
    "per-priority, and grand-total counts + decimal totalprice sums in one "
    "pass — the partial-aggregation tree Catalyst plans natively.",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)").alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n", "total",
        )
    )
