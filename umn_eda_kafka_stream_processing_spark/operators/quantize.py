"""INT8 embedding quantization — exact integer-micro affine codes.

A 100 TB embedding corpus at float32x64 is ~4x bigger than it needs
to be for shortlist/ANN work: per-dimension affine INT8 codes keep
recall within noise for cosine/L2 shortlists (re-rank on the float
vectors as `pq_search_topk` already does for PQ) while cutting the
scanned bytes 4x. This module is the scalar-quantization sibling of
`operators/similarity.py`'s PQ family.

Everything is EXACT integer arithmetic after one micro-rounding of
each element (floor(x*1e6+0.5) — the repo's round_half_up, identical
on both engines), so codes, reconstructions, and error statistics
hash-match DuckDB bit-for-bit:

    code  = (x_micro - lo_d) * 255  div  max(hi_d - lo_d, 1)
    x_hat = lo_d + (code * rng_d) div 255
    err   = |x_micro - x_hat|

(x_micro - lo_d >= 0, so `div` truncation == floor on both engines;
a constant dimension (hi == lo) maps to code 0 and reconstructs
exactly.)

Scale shape: one posexplode pass (n x dim rows — the standard
columnar stats pass), per-dimension lo/hi is a |dim|-row aggregate
BROADCAST back onto the elements (never a shuffle of the corpus on
anything but the explode), and re-packing to arrays is one hash-agg
per vector. All JVM-side column expressions — no Python in the path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def int8_quantize_elements(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-element INT8 codes + exact reconstruction error.

    Returns one row per (input row, dimension): all input columns
    except ``vec_col``, plus ``pos`` (0-based dimension), ``x_micro``
    (the micro-rounded element), ``code`` (0..255), ``xhat_micro``
    (the dequantized value) and ``err_micro`` = |x - x_hat|.

    The per-dimension (lo, hi) stats are computed from THIS frame —
    train == serve. For a frozen-quantizer ingest path, compute
    ``int8_stats`` once and pass it to ``int8_apply``.
    """
    e = _explode_micro(df, vec_col)
    return int8_apply(e, int8_stats(e))


def int8_stats(elements: DataFrame) -> DataFrame:
    """Per-dimension (pos, lo, hi) over an exploded element frame —
    a |dim|-row aggregate (the quantizer 'model')."""
    return elements.groupBy("pos").agg(
        F.min("x_micro").alias("lo"), F.max("x_micro").alias("hi")
    )


def int8_apply(elements: DataFrame, stats: DataFrame) -> DataFrame:
    """Code + reconstruction error for each element under a given
    per-dimension stats frame (broadcast — |dim| rows). Elements
    outside [lo, hi] (serve-time drift under a frozen quantizer)
    clamp into the code range, the standard SQ behavior."""
    q = (
        elements.join(F.broadcast(stats), "pos")
        .withColumn(
            "_rng", F.greatest(F.col("hi") - F.col("lo"), F.lit(1))
        )
        .withColumn(
            "_clamped",
            F.greatest(
                F.least(F.col("x_micro"), F.col("hi")), F.col("lo")
            ),
        )
        .withColumn(
            "code",
            F.expr("((_clamped - lo) * 255) div _rng").cast("long"),
        )
        .withColumn(
            "xhat_micro",
            (F.col("lo") + F.expr("(code * _rng) div 255")).cast("long"),
        )
        .withColumn(
            "err_micro",
            F.abs(F.col("x_micro") - F.col("xhat_micro")).cast("long"),
        )
    )
    return q.drop("lo", "hi", "_rng", "_clamped")


def int8_pack(
    elements: DataFrame, id_cols: str | Sequence[str]
) -> DataFrame:
    """Re-assemble per-element codes into one ``codes`` array per
    vector (ordered by dimension) — one hash-agg, the write-side
    shape for a quantized corpus table."""
    ids = [id_cols] if isinstance(id_cols, str) else list(id_cols)
    return elements.groupBy(*ids).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "code"))),
            lambda s: s.code.cast("int"),
        ).alias("codes")
    )


def _explode_micro(df: DataFrame, vec_col: str) -> DataFrame:
    keep = [c for c in df.columns if c != vec_col]
    return df.select(
        *keep, F.posexplode(F.col(vec_col)).alias("pos", "_x")
    ).select(
        *keep,
        "pos",
        F.floor(F.col("_x").cast("double") * MICRO + F.lit(0.5))
        .cast("long")
        .alias("x_micro"),
    )
