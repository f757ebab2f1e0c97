"""Parquet source for the driver's synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an sf dir.

Columnar parquet is the engine's canonical batch source: Catalyst
pushes filters and column pruning into the scan (verify with
``.explain('formatted')`` → PushedFilters / ReadSchema), which is the
single biggest lever at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(NANOS) which Spark's parquet
    # reader rejects by default; read the nanos as a plain long
    # (epoch-nanos). Downstream code derives µs timestamps via
    # timestamp_micros(ts div 1000). Runtime-settable, so this works
    # on caller-provided sessions too (e.g. the driver's).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
