"""Skew-mitigation operators.

At 100 TB a handful of hot keys (a viral artist, one dominant
language) can put an entire ``groupBy``/join key on one reducer. AQE's
skew-join splitting (enabled in session.py) handles the JOIN side at
runtime; these helpers handle the AGGREGATION side and give an
explicit, plannable alternative when AQE's heuristics aren't enough.

* ``salted_grouped_count`` — two-stage count: map keys onto
  (key, salt) with a deterministic per-row salt, partially aggregate
  (spreads one hot key over ``salt_buckets`` reducers), then sum the
  partials. Result is IDENTICAL to ``groupBy(key).count()`` — counts
  are distributive — at the cost of a second (tiny) shuffle over
  |keys| x salt_buckets rows.
* ``salted_agg`` — the same two-stage shape for any distributive
  aggregate pair (e.g. partial sum → sum, partial max → max).

The salt is ``pmod(hash(row-identity cols), buckets)`` when identity
columns are given (deterministic, replay-stable) or a uniform random
otherwise (counts don't care which bucket a row lands in).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(salt_cols: Sequence[str] | None, buckets: int) -> Column:
    if salt_cols:
        return F.pmod(F.hash(*[F.col(c) for c in salt_cols]), F.lit(buckets))
    return (F.rand() * buckets).cast("int")


def salted_grouped_count(
    df: DataFrame,
    group_cols: str | Sequence[str],
    salt_buckets: int = 16,
    salt_cols: Sequence[str] | None = None,
    count_name: str = "count",
) -> DataFrame:
    """groupBy(...).count() with a salted first stage; identical
    result, hot keys spread over ``salt_buckets`` reducers."""
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    partial = (
        df.withColumn("_salt", _salt(salt_cols, salt_buckets))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(count_name))


def salted_agg(
    df: DataFrame,
    group_cols: str | Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_buckets: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-stage salted aggregation for distributive aggregates.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` re-combine
    the partials per key and must reference the partials' aliases
    (e.g. partial ``sum(x) AS s`` → final ``sum(s) AS s``).
    """
    keys = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    partial = (
        df.withColumn("_salt", _salt(salt_cols, salt_buckets))
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)
