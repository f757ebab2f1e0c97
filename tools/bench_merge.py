"""Merge sharded bench detail files into one BENCH_DETAIL.json.

Usage:
    SPARK_GRAFT_BENCH_SHARD=0/2 SPARK_GRAFT_BENCH_DETAIL=/tmp/bd0.json python bench.py
    SPARK_GRAFT_BENCH_SHARD=1/2 SPARK_GRAFT_BENCH_DETAIL=/tmp/bd1.json python bench.py
    python tools/bench_merge.py BENCH_DETAIL.json /tmp/bd0.json /tmp/bd1.json

Each shard pass fits the wall-clock budget with full warm sampling
(the single-pass catalog run escrows a third of the medians to
cold-only — round-11), so the merged artifact carries a warm median
for every query. Query sets must be disjoint; totals/families are
recomputed from the merged per-query medians, telemetry is kept
per shard.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from umn_eda_kafka_stream_processing_spark.plans import REGISTRY  # noqa: E402


def merge(paths: list[str]) -> dict:
    shards = [json.load(open(p)) for p in paths]
    queries: dict[str, float] = {}
    walls: dict[str, list[float]] = {}
    cold_only: list[str] = []
    substrate_cold: dict[str, dict] = {}
    for s in shards:
        dup = set(s["queries"]) & set(queries)
        if dup:
            raise SystemExit(f"overlapping shards: {sorted(dup)[:5]} ...")
        queries.update(s["queries"])
        walls.update(s["walls"])
        cold_only.extend(s.get("cold_only", []))
        substrate_cold.update(s.get("substrate_cold", {}))
    missing = [n for n in REGISTRY if n not in queries]
    if missing:
        print(
            f"WARNING: merged detail missing {len(missing)} registry "
            f"queries: {missing[:5]} ...",
            file=sys.stderr,
        )
    # queries no longer in the registry (renamed/removed since the
    # shard ran) are DROPPED entirely — keeping them in `value` but
    # not in `families` would break the documented
    # sum(families) == value reconciliation
    stale = sorted(n for n in queries if n not in REGISTRY)
    if stale:
        print(
            f"WARNING: dropping {len(stale)} stale queries absent "
            f"from the registry: {stale[:5]} ...",
            file=sys.stderr,
        )
        for n in stale:
            queries.pop(n)
            walls.pop(n, None)
    # always filter cold_only to names present in the merged queries
    # (not just in the stale branch): a shard whose cold_only lists a
    # query absent from its own queries map must warn, not KeyError
    # in cold_only_sec below (round-12 advice)
    dropped = sorted(n for n in set(cold_only) if n not in queries)
    if dropped:
        print(
            f"WARNING: dropping {len(dropped)} cold_only entries "
            f"absent from merged queries: {dropped[:5]} ...",
            file=sys.stderr,
        )
    cold_only = [n for n in cold_only if n in queries]
    cold_set = set(cold_only)
    warm_total = round(
        sum(v for n, v in queries.items() if n not in cold_set), 3
    )
    families: dict[str, float] = {}
    for name, v in queries.items():
        if name in cold_set or name not in REGISTRY:
            continue
        fam = REGISTRY[name].spark.__module__.rsplit(".", 1)[-1]
        fam = fam.removeprefix("catalog_") if fam != "catalog" else "core"
        families[fam] = families.get(fam, 0.0) + v
    base = shards[0]
    return {
        "metric": base["metric"],
        "value": warm_total,
        "unit": "sec",
        "queries": dict(sorted(queries.items())),
        "runs": base["runs"],
        "degraded_to_single_run": sum(
            s.get("degraded_to_single_run", 0) for s in shards
        ),
        "heavy_capped": sum(s.get("heavy_capped", 0) for s in shards),
        "stable_stopped": sum(s.get("stable_stopped", 0) for s in shards),
        "cold_only": sorted(cold_only),
        "cold_only_sec": round(sum(queries[n] for n in cold_only), 3),
        "families": {k: round(v, 2) for k, v in sorted(families.items())},
        "walls": dict(sorted(walls.items())),
        "substrate_cold": {
            k: substrate_cold[k]
            for k in sorted(substrate_cold)
            if k in queries
        },
        "sf": base["sf"],
        "merged_from": [
            {
                "shard": s.get("shard"),
                "box_load_pre": s.get("box_load_pre"),
                "box_load": s.get("box_load"),
                "noisy": s.get("noisy"),
            }
            for s in shards
        ],
        "noisy": any(s.get("noisy") for s in shards),
    }


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    out, paths = sys.argv[1], sys.argv[2:]
    merged = merge(paths)
    with open(out, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        f"{out}: {len(merged['queries'])} queries, warm total "
        f"{merged['value']}s, cold_only {len(merged['cold_only'])}"
    )


if __name__ == "__main__":
    main()
