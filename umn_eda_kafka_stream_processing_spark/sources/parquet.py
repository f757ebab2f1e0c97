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
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.parquet stores TIMESTAMP(NANOS); pyspark >= 4.1 reads it
    # as TIMESTAMP_NTZ (µs — lossless on this data, the generator is
    # µs-aligned) and dropped the legacy nanosAsLong long-read. All
    # timestamp columns (events.ts, o_orderdate, l_shipdate) are NTZ:
    # naive values, so comparisons / date_format never shift with the
    # caller session's timezone — matching DuckDB's naive TIMESTAMP.
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Round 2's driver run broke when the runtime's parquet-nanos
        # mapping changed under us (long → NTZ). Pin the engine-wide
        # contract here instead of per query: ts is TIMESTAMP_NTZ. If
        # a future runtime reads nanos as epoch-long again, rebuild
        # NTZ from the long (integer µs div — doubles lose ns above
        # 2^53); any other mapping normalizes with a plain cast.
        ts_type = df.schema["ts"].dataType
        from pyspark.sql.types import LongType, TimestampNTZType

        # Both fallbacks must construct NTZ WITHOUT an LTZ hop:
        # timestamp_micros() returns session-tz TIMESTAMP_LTZ and the
        # LTZ→NTZ cast renders in the session timezone — on a non-UTC
        # driver every ts would shift and all event-time oracles fail
        # (the uncontrolled-tz scenario test_timezone_independence
        # exists for). timestampadd onto an NTZ epoch literal stays
        # timezone-free end to end.
        if isinstance(ts_type, LongType):
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000, "
                    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
        elif not isinstance(ts_type, TimestampNTZType):
            # LTZ (or string/date) input: extract the instant's epoch
            # micros (unix_micros is timezone-free) and rebuild NTZ as
            # the UTC wall clock of that instant — never a direct
            # LTZ→NTZ cast, which renders in the session timezone
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, "
                    "unix_micros(CAST(ts AS TIMESTAMP)), "
                    "TIMESTAMP_NTZ'1970-01-01 00:00:00')"
                ),
            )
    return df


def spread(df, key_col: str):
    """Hash-repartition to full parallelism by ``key_col``.

    For heavy per-row computation (hashing, regex, HOF folds) over a
    SMALL file: a one-file scan is ONE partition, so the work would
    run single-threaded regardless of cores; explicit count keeps AQE
    from re-coalescing. At cluster scale a multi-file scan is already
    parallel and this becomes one cheap narrow-ish shuffle.
    """
    from pyspark.sql import functions as F

    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, F.col(key_col))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql()."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      files_per_partition: int | None = None) -> None:
    """Hive-style partitioned parquet layout (``col=value/`` dirs).

    At 100 TB the directory layout IS the primary index: a filter on a
    partition column becomes a PartitionFilters entry and Spark never
    lists, opens, or reads the pruned directories. Choose low-
    cardinality columns (lang, source, date) — a high-cardinality
    partition column creates millions of small files instead.

    ``files_per_partition`` caps output files per partition dir
    (repartition by the partition key first) — the small-files guard
    for wide-parallelism writers.
    """
    from pyspark.sql import functions as F

    if files_per_partition:
        df = df.repartition(files_per_partition, *[F.col(c) for c in partition_cols])
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
