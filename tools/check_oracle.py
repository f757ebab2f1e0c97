"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle at a given
sf dir, then compares row count, column names, and order-insensitive
values (exact match after the catalog's own normalization). Usage:

    python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

--json writes a driver-shaped artifact ({name: {rows_match,
schema_match, hash_match, spark_rows, oracle_rows, err}}) covering
the FULL catalog — the committed ORACLE_FULL_r{N}.json files extend
the driver's 50-query gate (see plans/priority.py) to all queries.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umn_eda_kafka_stream_processing_spark.plans import REGISTRY
from umn_eda_kafka_stream_processing_spark.session import get_spark
from umn_eda_kafka_stream_processing_spark.sources.parquet import TESTDATA_TABLES


def _hash_str(v):
    """The driver hashes STRINGIFIED values, so two numerically-equal
    values with different reprs (Decimal('1.40') vs 1.4, Decimal scale
    drift between engines) are a driver-level MISMATCH. Round-1 blind
    spot: comparing raw Python objects let Decimal('1.40') ==
    Decimal('1.4') pass locally while the driver failed the hash."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def norm_rows(cols, rows):
    """Sort columns by name, then rows — the driver's order-insensitive
    compare sorts columns by name before hashing stringified values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_hash_str(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            print("--json requires an output path")
            return 2
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    unknown = only - set(REGISTRY)
    if unknown:
        print(f"unknown query names: {sorted(unknown)}")
        return 2
    # a query-filtered run writes a PARTIAL artifact; refuse the
    # committed full-catalog naming so a subset can't silently
    # overwrite ORACLE_FULL_r{N}.json
    if json_out and only and "ORACLE_FULL" in os.path.basename(json_out):
        print(
            f"refusing: --json {json_out} with a query subset would "
            "overwrite a full-catalog artifact; drop the query filter "
            "or choose another output name"
        )
        return 2
    spark = get_spark(app_name="oracle-check")
    # absorb session warmup (JVM codegen, parquet reader init) OUTSIDE
    # the per-query timers — otherwise the first catalog query records
    # ~6 s of one-time cost and tops every "slowest queries" list
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    results: dict[str, dict] = {}
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None,
               "spark_sec": None, "duck_sec": None, "err": None}
        results[name] = rec
        t0 = time.time()
        try:
            sdf = spec.spark(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            rec["err"] = traceback.format_exc()
            print(f"  {name:34s} ERROR (spark) — see artifact")
            failures.append(name)
            continue
        spark_s = time.time() - t0
        rec["spark_rows"] = len(srows)
        rec["spark_sec"] = round(spark_s, 3)
        if spec.oracle is None:
            # rows_match stays None: an oracle-less query records its
            # row count, not a tautological pass (a len >= 0 check
            # would mask a broken query that returns nothing)
            print(f"  {name:34s} rows-only: {len(srows)} rows [{spark_s:.1f}s]")
            if not srows:
                print(f"  {name:34s} WARN oracle-less query returned 0 rows")
            continue
        t0 = time.time()
        try:
            res = con.execute(spec.oracle)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception:
            rec["err"] = traceback.format_exc()
            print(f"  {name:34s} ERROR (oracle) — see artifact")
            failures.append(name)
            continue
        duck_s = time.time() - t0
        rec["duck_sec"] = round(duck_s, 3)
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = False
        if ok_cols and ok_count:
            ok_vals = norm_rows(scols, srows) == norm_rows(dcols, drows)
        rec.update(rows_match=ok_count, schema_match=ok_cols,
                   hash_match=ok_vals, oracle_rows=len(drows))
        status = "OK " if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"  {name:34s} {status} rows={len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_cols else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"vals={'ok' if ok_vals else 'MISMATCH'} "
            f"[spark {spark_s:.1f}s duck {duck_s:.1f}s]"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_count:
                a = norm_rows(scols, srows)
                b = norm_rows(dcols, drows)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"      spark={x}\n      duck ={y}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} queries)")
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
