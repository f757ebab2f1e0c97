"""SQL-surface equivalence: every pipeline's SQL form returns the
same rows as its DataFrame form (plans/sql.py vs pipelines/*)."""

from __future__ import annotations

import pytest

from tests import fixtures as fx
from umn_eda_kafka_stream_processing_spark.pipelines import reference as ref
from umn_eda_kafka_stream_processing_spark.pipelines.topologies import TOPOLOGIES, run_batch
from umn_eda_kafka_stream_processing_spark.plans.sql import PIPELINE_SQL, register_entity_views


@pytest.fixture(scope="module")
def tables(spark):
    t = {
        "customer": fx.df(spark, "customer", [
            fx.customer("c1", birthdt="1994-04-01"),
            fx.customer("c2", birthdt="1988-01-01"),
            fx.customer("c3", birthdt="1999-12-31"),
        ]),
        "address": fx.df(spark, "address", [
            fx.address("ad1", "c1", state="MN"),
            fx.address("ad2", "c2", state="WI"),
            fx.address("ad3", "c3", state="MN"),
            fx.address("ad9", "v-a1", state="IA"),   # venue address
        ]),
        "artist": fx.df(spark, "artist", [
            fx.artist("a1", genre="Rock"), fx.artist("a2", genre="Jazz"),
        ]),
        "event": fx.df(spark, "event", [
            fx.event("e1", "a1", "v1", 3), fx.event("e2", "a2", "v1", 50),
        ]),
        "venue": fx.df(spark, "venue", [fx.venue("v1", "ad9")]),
        "stream": fx.df(spark, "stream", [
            fx.stream(f"s{i}", c, a) for i, (c, a) in enumerate([
                ("c1", "a1"), ("c1", "a1"), ("c1", "a2"),
                ("c2", "a2"), ("c3", "a1"),
            ])
        ]),
        "ticket": fx.df(spark, "ticket", [
            fx.ticket(f"t{i}", c, e) for i, (c, e) in enumerate([
                ("c1", "e1"), ("c2", "e1"), ("c3", "e1"), ("c1", "e1"),
                ("c2", "e2"),
            ])
        ]),
    }
    register_entity_views(spark, t)
    return t


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


@pytest.mark.parametrize("name", sorted(PIPELINE_SQL))
def test_sql_matches_dataframe_pipeline(spark, tables, name):
    sql_df = spark.sql(PIPELINE_SQL[name])
    if name == "AddressSortAndStringify":
        mn, other = ref.address_sort_and_stringify(tables["address"])
        df = mn.unionByName(other)
    else:
        df = run_batch(name, tables)
    cols = [c for c in sql_df.columns if c in df.columns]
    assert cols, f"no shared columns for {name}"
    assert _rows(sql_df, cols) == _rows(df, cols)


def test_topology_registry_covers_reference():
    assert set(TOPOLOGIES) == set(PIPELINE_SQL)
    for t in TOPOLOGIES.values():
        assert all(o.startswith("kafka-workshop-") for o in t.outputs)
