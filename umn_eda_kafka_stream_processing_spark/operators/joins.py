"""Join operators beyond plain equi-joins.

The reference's only join is the KStream⋈KTable inner equi-join
(SURVEY.md §2.3); Spark's ``how=`` parameter covers outer/semi/anti
for free. This module adds the two join families a complete engine
needs that Spark has no single operator for:

* ``asof_join``   — temporal as-of: each fact row picks up the latest
  update with update_time <= fact_time for its key. This is ALSO the
  faithful generalization of the reference's stream⋈table semantics
  (a stream record joins table state *as of its arrival* —
  SURVEY.md §2.3; the batch pipelines use latest-overall because the
  reference tests always pipe dims first).
* ``interval_join`` — fact time within [start, end] of the other side.

Scale notes: asof_join is the union-then-window formulation — ONE
shuffle+sort of facts+updates on the key, no per-row lookups, no
broadcast requirement on either side; this is the canonical
distributed as-of (same shape Flink/kdb+ batch equivalents use).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    updates: DataFrame,
    key_cols: str | Sequence[str],
    fact_time: str,
    update_time: str,
    payload_cols: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """As-of join: attach to each fact row the payload of the latest
    update (by ``update_time``) with time <= the fact's ``fact_time``,
    per key.

    ``updates`` must be unique per (key, update_time) — pre-dedupe
    with latest_by_key otherwise (ties would be nondeterministic in
    ANY engine's as-of). ``how``: 'inner' drops facts with no prior
    update; 'left' keeps them with null payload.

    Implementation: union updates (tag 0) and facts (tag 1) on
    (key, time, tag), then one window pass carrying the last non-null
    payload forward; updates at exactly the fact's time win (<= is
    inclusive), because tag 0 sorts first within a timestamp.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    fact_payload = [c for c in facts.columns if c not in keys and c != fact_time]
    clash = set(fact_payload) & set(payload_cols)
    if clash:
        raise ValueError(
            f"asof_join output would contain duplicate columns {sorted(clash)}; "
            "rename one side before joining"
        )
    u = updates.select(
        *[F.col(k) for k in keys],
        F.col(update_time).alias("_t"),
        F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{facts.schema[c].dataType.simpleString()}" for c in fact_payload
            ) + ">"
        ).alias("_f"),
    )
    f = facts.select(
        *[F.col(k) for k in keys],
        F.col(fact_time).alias("_t"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{updates.schema[c].dataType.simpleString()}" for c in payload_cols
            ) + ">"
        ).alias("_p"),
        F.struct(*[F.col(c) for c in fact_payload]).alias("_f"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("_t", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = (
        u.unionByName(f)
        .withColumn("_asof", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if how == "inner":
        attached = attached.filter(F.col("_asof").isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join supports inner/left, got {how!r}")
    return attached.select(
        *keys, F.col("_t").alias(fact_time), "_f.*", "_asof.*"
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    key_cols: str | Sequence[str],
    fact_time: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Fact rows joined to interval rows of the same key where
    start <= fact_time < end (right-open, the streaming convention).

    Plain equi-join on the key with the range as a join predicate —
    Catalyst evaluates the range during the hash probe, so cost is
    |matches|, not |facts|x|intervals|. For keyless range joins
    bucketize the time dimension first (bucket = floor(t / width)
    on both sides, like dedup.ngram_jaccard_pairs' length bands).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # qualify through the parent DataFrames: unqualified F.col would be
    # ambiguous whenever both sides carry a column with the same name
    cond = (facts[fact_time] >= intervals[start_col]) & (
        facts[fact_time] < intervals[end_col]
    )
    for k in keys:
        cond = (facts[k] == intervals[k]) & cond
    joined = facts.join(intervals, cond, how)
    # drop the duplicate key columns from the interval side
    out_cols = [facts[c] for c in facts.columns] + [
        intervals[c] for c in intervals.columns if c not in keys
    ]
    return joined.select(*out_cols)
