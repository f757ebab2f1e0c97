"""Sequence-packing catalog queries (context-window filling).

The DuckDB oracle replays the exact per-shard next-fit recurrence of
``operators/packing.py`` as a recursive CTE: rows join rank rn to
rn+1 within their shard, carrying (fill, bin) state — bit-identical
to the applyInPandas pass because both are pure functions of
(doc_id order, token counts, capacity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.functions.text import token_count
from umn_eda_kafka_stream_processing_spark.operators.packing import pack_sequences, pack_stats
from umn_eda_kafka_stream_processing_spark.plans.registry import register as _register
from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table

_CAPACITY = 128
_SHARDS = 8

_DUCK_TOKENS_N = r"cast(len(string_split_regex(trim(text), '\s+')) as bigint)"

_PACK_CTE = f"""
    WITH RECURSIVE d AS (
      SELECT doc_id AS id, doc_id % {_SHARDS} AS shard,
             {_DUCK_TOKENS_N} AS tokens,
             row_number() OVER (PARTITION BY doc_id % {_SHARDS} ORDER BY doc_id) AS rn
      FROM documents
    ), pack AS (
      SELECT shard, rn, id, tokens, tokens AS fill, 0 AS bin
      FROM d WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.id, d.tokens,
             CASE WHEN p.fill + d.tokens <= {_CAPACITY}
                  THEN p.fill + d.tokens ELSE d.tokens END,
             CASE WHEN p.fill + d.tokens <= {_CAPACITY}
                  THEN p.bin ELSE p.bin + 1 END
      FROM d JOIN pack p ON d.shard = p.shard AND d.rn = p.rn + 1
    )
"""


@_register(
    "sequence_packing",
    "Next-fit context-window packing: docs hash-sharded, ordered by id, "
    "packed into 128-token bins per shard via one linear applyInPandas "
    "pass (operators/packing.py:pack_sequences). Oracle replays the "
    "recurrence as a recursive CTE.",
    _PACK_CTE + """
    SELECT cast(id AS bigint) AS doc_id, cast(shard AS bigint) AS shard,
           cast(bin AS bigint) AS bin, tokens
    FROM pack
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_tok = docs.select("doc_id", token_count().alias("n_tokens"))
    return pack_sequences(with_tok, "doc_id", "n_tokens", _CAPACITY, _SHARDS).select(
        F.col("id").alias("doc_id"), "shard", "bin", "tokens"
    )


@_register(
    "sequence_packing_stats",
    "Per-(shard, bin) packing telemetry over the next-fit assignment: "
    "doc count, tokens used, waste vs the 128-token capacity "
    "(operators/packing.py:pack_stats).",
    _PACK_CTE + f"""
    SELECT cast(shard AS bigint) AS shard, cast(bin AS bigint) AS bin,
           cast(count(*) AS bigint) AS n_docs,
           cast(sum(tokens) AS bigint) AS bin_tokens,
           cast(greatest(0, {_CAPACITY} - sum(tokens)) AS bigint) AS waste
    FROM pack GROUP BY shard, bin
    """,
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_tok = docs.select("doc_id", token_count().alias("n_tokens"))
    packed = pack_sequences(with_tok, "doc_id", "n_tokens", _CAPACITY, _SHARDS)
    return pack_stats(packed, _CAPACITY)
