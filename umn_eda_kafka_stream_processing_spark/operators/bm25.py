"""BM25 keyword search over the document corpus — the retrieval
primitive data-curation stacks run next to embedding ANN (quality
probes, decontamination lookups, targeted corpus slicing: "find the
docs that answer this query" without a model in the loop).

Spark shape: the INDEX is three hash-aggregations over the exploded
token stream — postings (term, doc, tf), doc lengths, and document
frequencies — i.e. a classic distributed inverted index build: one
shuffle keyed by term, map-side combined, uniformly sharded (term
keys behave like the md5 keys of `exact_dedup_groups`). SEARCH
broadcasts the query-term list (tiny), joins it to the postings on
term (at 100 TB: a bucketed-by-term postings table makes this a
partition-pruned lookup — only the queried terms' buckets are read),
and one (query, doc) hash-agg sums the per-term contributions; top-k
ranks inside each query's partition only.

Engine portability (the integer-micros rule): idf(t) =
ln((N - df + 0.5) / (df + 0.5) + 1) (the Lucene BM25 idf — always
positive) is ONE transcendental per DISTINCT term on exact-integer-
±0.5 doubles, micro-rounded half-up to BIGINT. The per-(doc, term)
contribution multiplies that integer by the tf saturation
tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) — a short, fixed-order
chain of IEEE double ops on exact integer inputs — and micro-rounds
AGAIN to BIGINT, so the per-document score is an exact integer SUM
over the (few) query terms: order-independent, hash-equal across
engines. Ranks break ties by doc id on those exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K1 = 1.2
B = 0.75


def bm25_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int, int]:
    """Build the inverted index: returns (postings, doclens, n_docs,
    total_tokens) where postings = (term, id, tf, idf_micro) and
    doclens = (id, dl). Lowercased whitespace tokens; empty docs
    contribute a zero-length row to doclens (they can never match but
    keep n_docs honest). Only the two corpus scalars reach the
    driver."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.split(F.trim(F.col(text_col)), r"\s+"),
                lambda w: F.lower(w),
            )
        ).alias("term"),
    ).filter(F.col("term") != "")
    # ONE corpus pass: everything else (doc lengths, document
    # frequencies, the total-token scalar) derives from the
    # checkpointed (id, term, tf) aggregate, not from re-exploding
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    doclens = docs.select(id_col).join(
        tf.groupBy(id_col).agg(F.sum("tf").cast("long").alias("dl")),
        id_col,
        "left",
    ).select(id_col, F.coalesce("dl", F.lit(0)).cast("long").alias("dl"))
    n_docs = docs.count()
    total_tokens = int(tf.agg(F.sum("tf")).collect()[0][0] or 0)
    dfreq = tf.groupBy("term").agg(
        F.countDistinct(id_col).cast("long").alias("df")
    )
    idf = dfreq.select(
        "term",
        F.floor(
            F.log(
                (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("idf_micro"),
    )
    postings = tf.join(F.broadcast(idf), "term").select(
        "term", id_col, "tf", "idf_micro"
    )
    return postings, doclens, n_docs, total_tokens


def bm25_search(
    postings: DataFrame,
    doclens: DataFrame,
    n_docs: int,
    total_tokens: int,
    queries: DataFrame,
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents per query: ``queries`` = (qid, term) with
    one row per DISTINCT query term (BM25's standard bag-of-terms
    scoring counts each matched term once per occurrence in the
    QUERY; pass repeated rows to weight repeats). Returns (qid, rank,
    id, score_micro) ranked by (score DESC, id ASC).

    Plan: broadcast the query terms into the postings join (term-
    pruned scan at scale), one (qid, doc) hash-agg of exact integer
    contributions, and a per-qid window for the top-k — partitioned
    by qid, never a global sort."""
    # dl/avgdl as (dl * n_docs) / total_tokens: one division, exact
    # integer product inputs — the order the oracle mirrors
    norm = (
        F.lit(1.0)
        - F.lit(B)
        + F.lit(B)
        * (
            (F.col("dl") * F.lit(float(n_docs)))
            / F.lit(float(total_tokens))
        )
    )
    contrib = F.floor(
        F.col("idf_micro")
        * (
            (F.col("tf") * F.lit(K1 + 1.0))
            / (F.col("tf") + F.lit(K1) * norm)
        )
        + F.lit(0.5)
    ).cast("long")
    scored = (
        postings.join(F.broadcast(queries), "term")
        .join(doclens.hint("shuffle_hash"), id_col)
        .groupBy("qid", id_col)
        .agg(F.sum(contrib).cast("long").alias("score_micro"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("score_micro").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", id_col, "score_micro")
    )
