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

The salt is ``pmod(hash(salt cols), buckets)`` — deterministic and
replay-stable. ``F.rand()`` is deliberately NOT used: random values
depend on within-partition row order, which is nondeterministic
downstream of a shuffle, so a retried map task could re-salt its rows
differently and double-count/drop them across salt buckets. With no
``salt_cols`` given, every column is hashed (identical rows co-bucket,
which is harmless for distributive aggregates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, salt_cols: Sequence[str] | None, buckets: int) -> Column:
    cols = list(salt_cols) if salt_cols else list(df.columns)
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets))


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
        df.withColumn("_salt", _salt(df, salt_cols, salt_buckets))
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
        df.withColumn("_salt", _salt(df, salt_cols, salt_buckets))
        .groupBy(*keys, "_salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)
