"""In-memory fixture source — the engine-side analogue of the
reference's ``TopologyTestDriver.pipeInput(key, value)`` test input
path (reference: samples/PurchaseEventTicketTest.java:49-65).

Rows are (key, value-dict) pairs in arrival order; we attach the
envelope columns (key, event_seq) that arrival-order-dependent
operators (latest_by_key, running aggregates) consume.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def rows_df(
    spark: SparkSession,
    schema: T.StructType,
    rows: Iterable[tuple[str, Mapping[str, Any]]],
    start_seq: int = 0,
) -> DataFrame:
    """Build a DataFrame from (key, value) pairs with arrival order.

    ``rows`` is ordered; ``event_seq`` is assigned 0..n-1 (offset by
    ``start_seq`` so successive pipes can interleave like successive
    ``pipeInput`` calls in the reference tests).
    """
    data = []
    for i, (key, value) in enumerate(rows):
        rec = dict(value)
        rec["key"] = key
        rec["event_seq"] = start_seq + i
        data.append(tuple(rec.get(f.name) for f in schema.fields))
    return spark.createDataFrame(data, schema)
