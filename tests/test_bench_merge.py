"""tools/bench_merge.py unit tests — pure python, no Spark.

Pins the round-12 advice fix: a shard whose cold_only names a query
absent from the merged queries map (renamed/dropped between shard
runs) must be filtered with a warning, never crash cold_only_sec
with a KeyError.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from umn_eda_kafka_stream_processing_spark.plans import REGISTRY  # noqa: E402
from tools.bench_merge import merge  # noqa: E402


def _shard(tmp_path, name, queries, cold_only=()):
    p = tmp_path / name
    p.write_text(json.dumps({
        "metric": "catalog_total_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "walls": {k: [v] for k, v in queries.items()},
        "cold_only": list(cold_only),
        "runs": 2,
        "sf": 0.1,
        "shard": name,
        "noisy": False,
    }))
    return str(p)


def test_merge_filters_stale_cold_only(tmp_path):
    names = sorted(REGISTRY)[:4]
    s0 = _shard(tmp_path, "s0.json", {names[0]: 1.0, names[1]: 2.0},
                cold_only=[names[1], "renamed_away_query"])
    s1 = _shard(tmp_path, "s1.json", {names[2]: 3.0, names[3]: 4.0})
    m = merge([s0, s1])
    # the stale cold_only entry is dropped, the real one kept
    assert m["cold_only"] == [names[1]]
    assert m["cold_only_sec"] == 2.0
    # warm total excludes cold-only medians
    assert m["value"] == 8.0
    assert set(m["queries"]) == set(names)


def test_merge_rejects_overlapping_shards(tmp_path):
    import pytest

    names = sorted(REGISTRY)[:2]
    s0 = _shard(tmp_path, "s0.json", {names[0]: 1.0})
    s1 = _shard(tmp_path, "s1.json", {names[0]: 2.0, names[1]: 1.0})
    with pytest.raises(SystemExit, match="overlapping"):
        merge([s0, s1])
