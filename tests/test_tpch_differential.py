"""Randomized differential testing for the TPC-H rewrite queries.

The oracle gate proves Spark == DuckDB on the driver's fixed synthetic
tables; these tests prove it on ADVERSARIAL micro-datasets: hypothesis
generates random orders/lineitem contents with ship-delays biased onto
the 60/90-day lateness boundaries the adapted queries use, and every
example runs the catalog's Spark plan AND its DuckDB oracle on the
same parquet, comparing exact rows. This is the harness that would
catch a rewrite divergence (e.g. the q21 aggregate form drifting from
its EXISTS/NOT EXISTS oracle, or q13's ON-clause filter turning the
outer join inner) on data the fixed seed never produces.

Kept to the rewrite-heavy queries — verbatim aggregations are already
value-checked by the gate at three scales.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from umn_eda_kafka_stream_processing_spark.plans.registry import REGISTRY

QUERIES = [
    "q4_order_priority",
    "q13_customer_order_distribution",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "repeat_buyer_customers",
    "churned_customers",
    # partsupp-adapted rewrites (lineitem-mediated relation)
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q16_part_supplier_counts",
    "q20_volume_shippers",
]

_BASE = dt.datetime(1996, 7, 1)

# ship-delay biased onto the 60/90-day predicate boundaries
_delay = st.one_of(
    st.sampled_from([59, 60, 61, 89, 90, 91]), st.integers(0, 200)
)

_order = st.fixed_dictionaries({
    "cust": st.integers(1, 4),
    "status": st.sampled_from(["F", "O", "P"]),
    "total": st.integers(1, 40000),          # cents*? keep ints -> exact
    "day_off": st.one_of(
        st.integers(-550, 100),               # around the q4 quarter
        st.integers(1200, 1800),              # 1999-2001: recent/churn era
    ),
    "prio": st.sampled_from(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
    "lines": st.lists(st.fixed_dictionaries({
        "part": st.integers(1, 3),
        "supp": st.integers(1, 3),
        "qty": st.integers(1, 50),
        "price": st.integers(1, 10000),
        "delay": _delay,
    }), min_size=0, max_size=3),
})

_dataset = st.lists(_order, min_size=1, max_size=10)


def _write(tmp: str, orders) -> None:
    def w(name, cols):
        pq.write_table(pa.table(cols), os.path.join(tmp, f"{name}.parquet"))

    w("region", {"r_regionkey": pa.array([0, 1], pa.int32()),
                 "r_name": ["ASIA", "EUROPE"]})
    w("nation", {"n_nationkey": pa.array([2, 3, 7], pa.int32()),
                 "n_name": ["NATION_2", "NATION_3", "NATION_7"],
                 "n_regionkey": pa.array([0, 1, 0], pa.int32())})
    w("customer", {"c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
                   "c_name": ["C1", "C2", "C3", "C4"],
                   "c_nationkey": pa.array([3, 3, 7, 2], pa.int32()),
                   "c_acctbal": pa.array([5000.0, -100.0, 8000.0, 9000.0]),
                   "c_mktsegment": ["BUILDING"] * 4})
    # S2 above the q16 blacklist cut (< 1000), S1/S3 below — the
    # NOT IN branch must have members on both sides to bite
    w("supplier", {"s_suppkey": pa.array([1, 2, 3], pa.int64()),
                   "s_name": ["SUPP_1", "SUPP_2", "SUPP_3"],
                   "s_nationkey": pa.array([2, 3, 2], pa.int32()),
                   "s_acctbal": pa.array([100.0, 2000.0, 300.0])})
    w("part", {"p_partkey": pa.array([1, 2, 3], pa.int64()),
               "p_name": ["part1", "part2", "part3"],
               "p_brand": ["Brand#23", "Brand#12", "Brand#3"],
               "p_type": ["STANDARD", "PROMO", "ECONOMY"],
               "p_size": pa.array([10, 5, 30], pa.int32()),
               "p_retailprice": pa.array([10.0, 20.0, 30.0])})
    odates = [_BASE + dt.timedelta(days=o["day_off"]) for o in orders]
    w("orders", {
        "o_orderkey": pa.array(range(1, len(orders) + 1), pa.int64()),
        "o_custkey": pa.array([o["cust"] for o in orders], pa.int64()),
        "o_orderstatus": [o["status"] for o in orders],
        "o_totalprice": pa.array([float(o["total"]) for o in orders]),
        "o_orderdate": pa.array(odates, pa.timestamp("us")),
        "o_orderpriority": [o["prio"] for o in orders],
    })
    rows = []
    for okey, (o, od) in enumerate(zip(orders, odates), start=1):
        for i, ln in enumerate(o["lines"], start=1):
            rows.append((okey, ln["part"], ln["supp"], i, float(ln["qty"]),
                         float(ln["price"]), od + dt.timedelta(days=ln["delay"])))
    w("lineitem", {
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r[3] for r in rows], pa.int32()),
        "l_quantity": pa.array([r[4] for r in rows]),
        "l_extendedprice": pa.array([r[5] for r in rows]),
        "l_discount": pa.array([0.0] * len(rows)),
        "l_tax": pa.array([0.0] * len(rows)),
        "l_returnflag": ["N"] * len(rows),
        "l_linestatus": ["O"] * len(rows),
        "l_shipdate": pa.array([r[6] for r in rows], pa.timestamp("us")),
    })


def _normalize(rows, cols):
    # driver-style comparison: sort columns by name, then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(round(v, 9) if isinstance(v, float) else v
              for v in (r[i] for i in order))
        for r in rows
    )


@pytest.mark.parametrize("qname", QUERIES)
@given(orders=_dataset)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_spark_matches_duckdb_on_random_micro_data(spark, qname, orders):
    spec = REGISTRY[qname]
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, orders)
        sdf = spec.spark(spark, tmp)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        con = duckdb.connect()
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{tmp}/{t}.parquet')"
            )
        res = con.execute(spec.oracle)
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
        con.close()
    assert sorted(scols) == sorted(dcols)
    assert _normalize(srows, scols) == _normalize(drows, dcols)
