"""Environment canary: the dtype contract of every driver-generated
testdata table (TESTDATA.md), loaded through the engine's own source
(sources/parquet.py:load_table).

Round 2's two driver-gate failures came from the runtime moving under
the repo — pyspark 4.1 changed the parquet TIMESTAMP(NANOS) mapping
from epoch-long to TIMESTAMP_NTZ, silently breaking `ts div 1000`
arithmetic. This test makes the NEXT such environment bump fail
loudly in pytest (one parametrized case per table) before it fails
silently in the driver's correctness gate.
"""

from __future__ import annotations

import pytest

from umn_eda_kafka_stream_processing_spark.sources.parquet import (
    TESTDATA_TABLES,
    load_table,
)

_SF = "/root/testdata/sf0.001"

# column → expected Spark simpleString dtype, per table. Timestamps
# must surface as timestamp_ntz (naive, timezone-free — the whole
# oracle suite compares wall-clock values against DuckDB's naive
# TIMESTAMP); ids/counts as bigint/int; measures as double.
_EXPECTED: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {
        "n_nationkey": "int", "n_name": "string", "n_regionkey": "int",
    },
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz", "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint",
        "l_suppkey": "bigint", "l_linenumber": "int",
        "l_quantity": "double", "l_extendedprice": "double",
        "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    "events": {
        "event_id": "bigint", "ts": "timestamp_ntz", "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
}


def test_contract_covers_every_table():
    assert set(_EXPECTED) == set(TESTDATA_TABLES)


@pytest.mark.parametrize("table", TESTDATA_TABLES)
def test_table_dtype_contract(spark, table):
    df = load_table(spark, _SF, table)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert got == _EXPECTED[table], (
        f"{table}: dtype contract drift — the runtime's parquet type "
        f"mapping moved (got {got})"
    )
    assert df.count() > 0, f"{table}: empty at {_SF}"
