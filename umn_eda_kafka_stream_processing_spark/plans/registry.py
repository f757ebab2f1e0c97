"""Query registry shared by the catalog modules.

Each entry pairs a Spark implementation (spark_fn(spark, sf_dir) ->
DataFrame) with a DuckDB oracle SQL string producing identical
columns and normalized values (see catalog.py docstring for the
normalization rules). ``oracle=None`` marks genuinely
non-SQL-expressible ops — the driver records a weaker rows-only
check for those.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    doc: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, doc: str, oracle: str | None):
    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            # a silent overwrite would drop the first query from the
            # driver's correctness gate and the bench unnoticed
            raise ValueError(f"duplicate catalog query name {name!r}")
        if getattr(fn, "__name__", name) != name:
            # inserting a helper def between @register(...) and its
            # intended function silently rebinds the registration to
            # the helper (burned three times in round 9) — fail at
            # import instead of at the gate
            raise ValueError(
                f"catalog query {name!r} is registering a function "
                f"named {fn.__name__!r} — a def was probably inserted "
                "between the decorator and its query function"
            )
        REGISTRY[name] = QuerySpec(name=name, doc=doc, spark=fn, oracle=oracle)
        return fn
    return wrap
