"""Stream-stream joins — the KStream⋈KStream windowed join.

Kafka Streams joins two record streams by key within a time window
(JoinWindows.of(...)); the Structured Streaming form is a watermarked
interval join: both sides declare event-time watermarks, the join
condition pairs an equality key with a time-range predicate, and the
engine buffers each side's rows ONLY until the watermark says no
future match can arrive — bounded state, unlike the reference's
retention-sized window stores.

Scale: the join shuffles both streams on the key once; state size is
(rate × window) per side, independent of total history. Inner joins
emit as soon as both rows exist; outer joins hold the unmatched side
until the watermark closes its window, exactly like Kafka Streams'
grace-period semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    watermark: str = "30 seconds",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing ``key`` where
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    A symmetric ±W Kafka Streams JoinWindow is ``lower=-W, upper=W``.
    Both inputs must carry distinct timestamp column names (the output
    keeps both). ``how``: inner / leftOuter / rightOuter / fullOuter —
    outer results for unmatched rows emit once the watermark passes
    the window bound, per Structured Streaming semantics.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, f"__r_{key}")
    cond = (
        (F.col(key) == F.col(f"__r_{key}"))
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper_seconds} SECONDS"))
    )
    return lw.join(rw, cond, how).drop(f"__r_{key}")
