"""Edge-semantics tests for the TPC-H completion family
(plans/catalog_tpch.py) on a hand-built micro star schema.

The sf0.01 oracle gate proves value equality against DuckDB on bulk
data; these tests pin the SEMANTIC corners the bulk data may not
exercise on a given generator seed:

* q4  — EXISTS semi-join: one late line admits the order, an almost-
        late line (59 days) does not;
* q13 — LEFT OUTER with ON-clause filter: a customer whose only order
        is excluded by the filter still lands in the 0-orders bucket;
* q15 — scalar max subquery: revenue ties return BOTH suppliers;
* q17 — correlated per-part average: strict < at the 20% cut;
* q21 — EXISTS(other supplier) + NOT EXISTS(other late supplier)
        aggregate rewrite: sole-supplier and all-late orders drop out,
        exactly-one-late-among-many counts once;
* q22 — anti-join dormancy: an above-average-balance customer with a
        recent order is excluded, one with only old orders kept.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from umn_eda_kafka_stream_processing_spark.plans.registry import REGISTRY


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def micro_sf(tmp_path_factory):
    """Micro star schema with the same column names/dtypes as
    TESTDATA.md's reduced TPC-H tables."""
    d = tmp_path_factory.mktemp("tpch_micro")

    def write(name, cols):
        pq.write_table(pa.table(cols), str(d / f"{name}.parquet"))

    write("region", {
        "r_regionkey": pa.array([0, 1, 2], pa.int32()),
        "r_name": ["ASIA", "EUROPE", "AMERICA"],
    })
    write("nation", {
        "n_nationkey": pa.array([2, 3, 5, 7, 11], pa.int32()),
        "n_name": ["NATION_2", "NATION_3", "NATION_5", "NATION_7", "NATION_11"],
        "n_regionkey": pa.array([0, 1, 2, 0, 1], pa.int32()),
    })
    write("customer", {
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_name": ["C1", "C2", "C3", "C4", "C5"],
        "c_nationkey": pa.array([3, 3, 7, 5, 11], pa.int32()),
        "c_acctbal": pa.array([5000.0, 100.0, 8000.0, 9000.0, 7000.0]),
        "c_mktsegment": ["BUILDING", "AUTOMOBILE", "MACHINERY", "FURNITURE",
                         "HOUSEHOLD"],
    })
    write("supplier", {
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": ["SUPP_1", "SUPP_2", "SUPP_3"],
        "s_nationkey": pa.array([2, 3, 2], pa.int32()),  # S1/S3 ASIA, S2 EUROPE
        "s_acctbal": pa.array([100.0, 200.0, 300.0]),
    })
    write("part", {
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_name": ["part1", "part2", "part3"],
        "p_brand": ["Brand#23", "Brand#12", "Brand#3"],
        "p_type": ["STANDARD", "PROMO", "ECONOMY"],
        "p_size": pa.array([10, 5, 30], pa.int32()),
        "p_retailprice": pa.array([10.0, 20.0, 30.0]),
    })
    # O1..O3: C1, status F, ordered 1995-06-01 (q21 material)
    # O4: C2, status O (q21 must ignore), priority 5-LOW (q13 ON-filter)
    # O5/O6: the q4 quarter  O7: q15 quarter revenue  O8: recent (q22)
    write("orders", {
        "o_orderkey": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2, 2, 3, 4, 3], pa.int64()),
        "o_orderstatus": ["F", "F", "F", "O", "O", "O", "F", "O"],
        "o_totalprice": pa.array([180.0, 110.0, 30.0, 90.0, 40.0, 90.0, 250.0,
                                  10.0]),
        "o_orderdate": pa.array([_ts(s) for s in [
            "1995-06-01", "1995-06-01", "1995-06-01", "1995-06-01",
            "1996-07-15", "1996-08-01", "1995-12-20", "1999-05-01",
        ]], pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "5-LOW",
                            "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                            "1-URGENT"],
    })
    # (okey, pkey, skey, qty, price, shipdate); late := ship > odate+90d
    lines = [
        (1, 1, 1, 10.0, 100.0, "1995-12-01"),  # O1 S1 late
        (1, 2, 2, 5.0, 80.0, "1995-06-15"),    # O1 S2 on-time -> S1 counts
        (2, 1, 1, 10.0, 50.0, "1995-12-01"),   # O2 S1 late
        (2, 3, 2, 5.0, 60.0, "1995-12-15"),    # O2 S2 late -> both drop
        (3, 2, 1, 3.0, 30.0, "1995-10-01"),    # O3 sole supplier late -> drop
        (4, 1, 1, 1.0, 70.0, "1995-12-01"),    # O4 late but status O -> drop
        (4, 2, 2, 2.0, 20.0, "1995-06-20"),
        (5, 1, 1, 10.0, 40.0, "1996-09-20"),   # q4: +67d late -> O5 counted
        (6, 2, 2, 6.0, 90.0, "1996-09-25"),    # q4: +55d -> O6 not counted
        (7, 1, 1, 1.0, 60.0, "1996-01-10"),    # q15 quarter: S1 60+40=100
        (7, 2, 1, 2.0, 40.0, "1996-01-20"),
        (7, 3, 2, 3.0, 100.0, "1996-02-01"),   # S2 100 -> ties S1
        (7, 1, 3, 4.0, 50.0, "1996-03-01"),    # S3 50 (all within O7+90d)
    ]
    write("lineitem", {
        "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
        "l_partkey": pa.array([r[1] for r in lines], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in lines], pa.int64()),
        "l_linenumber": pa.array(range(1, len(lines) + 1), pa.int32()),
        "l_quantity": pa.array([r[3] for r in lines]),
        "l_extendedprice": pa.array([r[4] for r in lines]),
        "l_discount": pa.array([0.0] * len(lines)),
        "l_tax": pa.array([0.0] * len(lines)),
        "l_returnflag": ["N"] * len(lines),
        "l_linestatus": ["O"] * len(lines),
        "l_shipdate": pa.array([_ts(r[5]) for r in lines], pa.timestamp("us")),
    })
    return str(d)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_q4_exists_semi_join_late_threshold(spark, micro_sf):
    # quarter holds O5 (late line, +67d) and O6 (+55d, NOT late)
    out = _rows(REGISTRY["q4_order_priority"].spark(spark, micro_sf))
    assert out == [("2-HIGH", 1)]


def test_q13_on_clause_filter_keeps_zero_bucket(spark, micro_sf):
    # C1: 3 orders; C3: O6+O8 = 2; C2: only O5 (O4 is 5-LOW, excluded
    # by the ON clause, NOT by dropping the customer); C4: 1; C5: no
    # orders at all -> 0-bucket
    out = _rows(REGISTRY["q13_customer_order_distribution"].spark(spark, micro_sf))
    assert out == [(0, 1), (1, 2), (2, 1), (3, 1)]


def test_q15_max_revenue_tie_returns_both(spark, micro_sf):
    # Q1-1996 revenue: S1 = 60+40 = 100, S2 = 100, S3 = 50
    out = _rows(REGISTRY["q15_top_supplier"].spark(spark, micro_sf))
    assert out == [(1, "SUPP_1", 100.0), (2, "SUPP_2", 100.0)]


def test_q17_correlated_avg_strict_cut(spark, micro_sf):
    # Brand#23 = P1; quantities 10,10,1,10,1,4 -> avg 6, cut 1.2;
    # strictly-below lines are the two qty-1 rows (70 + 60 = 130)
    out = _rows(REGISTRY["q17_small_qty_revenue"].spark(spark, micro_sf))
    assert out == [(round(130.0 / 7.0, 2),)]


def test_q21_exists_notexists_rewrite(spark, micro_sf):
    # O1: S1 late, S2 on-time -> S1 counts once. O2: both late -> drop.
    # O3: sole supplier -> drop. O4: late but status O -> drop.
    out = _rows(REGISTRY["q21_waiting_suppliers"].spark(spark, micro_sf))
    assert out == [("SUPP_1", 1)]


def test_q22_recent_order_anti_join(spark, micro_sf):
    # coded {3,7,11,...}: C1 5000, C2 100, C3 8000, C5 7000 -> avg 5025.
    # Above: C3, C5. C3 has the 1999 order O8 -> excluded. C5 kept.
    out = _rows(REGISTRY["q22_dormant_customers"].spark(spark, micro_sf))
    assert out == [(11, 1, 7000.0)]
