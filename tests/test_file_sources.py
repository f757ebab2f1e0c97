"""CSV / JSON-lines / ORC ingest round-trips (sources/files.py):
explicit-schema loads produce frames identical to the parquet source."""

from __future__ import annotations

from pyspark.sql import functions as F

from umn_eda_kafka_stream_processing_spark.sources.files import (
    load_csv,
    load_jsonl,
    load_orc,
)
from umn_eda_kafka_stream_processing_spark.sources.parquet import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def _rows(df):
    return sorted(map(tuple, df.select("doc_id", "text", "lang", "source", "n_chars").collect()))


def test_csv_round_trip(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "docs_csv")
    # quote/escape defaults round-trip embedded separators and quotes
    docs.write.option("header", True).mode("overwrite").csv(out)
    back = load_csv(spark, out, docs.schema)
    assert _rows(back) == _rows(docs)


def test_jsonl_round_trip(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(out)
    back = load_jsonl(spark, out, docs.schema)
    assert _rows(back) == _rows(docs)


def test_orc_round_trip(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "docs_orc")
    docs.write.mode("overwrite").orc(out)
    back = load_orc(spark, out)
    assert _rows(back) == _rows(docs)


def test_jsonl_failfast_surfaces_malformed_rows(spark, tmp_path):
    import pytest

    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"doc_id": 1, "text": "ok"}\n{not json at all\n')
    df = load_jsonl(spark, str(bad), _docs(spark).schema)
    with pytest.raises(Exception):
        df.collect()
