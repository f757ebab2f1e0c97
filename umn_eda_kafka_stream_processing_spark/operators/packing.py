"""Sequence packing — fill fixed-size context windows with documents.

LLM pretraining wants every context window full: short documents are
concatenated until the next one would overflow, then a new window
starts. This operator is the distributed form of that packer.

Algorithm: NEXT-FIT within deterministic shards. Documents are
hash-sharded (``id % shards``), ordered by id within the shard, and
packed greedily: a doc joins the current bin if it fits, else opens a
new bin (an over-long doc gets a bin to itself). Next-fit is the ONLY
classical bin-packing heuristic that is one sequential pass with O(1)
state — which is exactly what makes it reproducible AND
shard-parallel; first-fit/best-fit keep every open bin live and
serialize the whole corpus.

Scale: the pack runs per shard via ``applyInPandas`` — one shuffle on
the shard key, then a linear Arrow-batched pass per shard. Shard count
is the parallelism knob: at 100 TB you raise ``shards`` so each shard
holds ~1 executor-core's worth of rows; the pack stays a single linear
pass per task. Determinism is total (pure function of ids + token
counts), so retries and the DuckDB recursive-CTE oracle agree exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    capacity: int,
    shards: int = 32,
) -> DataFrame:
    """Assign each row to a (shard, bin) context window.

    Output: (id, shard, bin, tokens) with bin numbering 0.. within
    each shard in id order. ``sum(tokens) <= capacity`` per bin unless
    a single row alone exceeds capacity (it then owns its bin).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")

    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.pmod(F.col(id_col), F.lit(shards)).cast("long").alias("shard"),
        F.col(tokens_col).cast("long").alias("tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        toks = pdf["tokens"].to_numpy()
        bins = [0] * len(toks)
        bin_ix, fill = 0, 0
        # sequential by construction (next-fit state is the previous
        # row's bin fill); linear in shard size, which the shard count
        # bounds — this loop is the per-task cost, not a global one.
        for i, t in enumerate(toks):
            t = int(t)
            if i == 0 or fill + t <= capacity:
                fill += t
            else:
                bin_ix += 1
                fill = t
            bins[i] = bin_ix
        out = pdf[["id", "shard", "tokens"]].copy()
        out["bin"] = pd.Series(bins, dtype="int64")
        return out[["id", "shard", "bin", "tokens"]]

    return base.groupBy("shard").applyInPandas(
        pack, "id long, shard long, bin long, tokens long"
    )


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Per-(shard, bin) packing telemetry: doc count, tokens used,
    and waste (capacity - used, floored at 0 for over-long docs)."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").alias("bin_tokens"),
        F.greatest(F.lit(0).cast("long"), F.lit(capacity) - F.sum("tokens")).alias("waste"),
    )
