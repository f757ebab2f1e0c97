"""Benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution is forced with the noop sink (full pipeline runs, nothing
serialized back to Python) — measures the engine, not driver-side
collect. One warm-up run of a trivial query first so JVM/codegen
startup isn't attributed to the first query.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from umn_eda_kafka_stream_processing_spark.plans import REGISTRY
from umn_eda_kafka_stream_processing_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="umn_eda_kafka_stream_processing_spark-bench")

    # warm-up: JVM, parquet footer reads, codegen
    REGISTRY["user_event_count"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name, spec in REGISTRY.items():
        t0 = time.time()
        spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # release the checkpointed/cached RDDs a query materialized
        # (the dedup pipelines localCheckpoint signatures) before the
        # next query: explicit unpersist beats waiting on the async
        # ContextCleaner, and keeps executor memory flat over the run
        gc.collect()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist()
        spark.sparkContext._jvm.System.gc()

    print(
        json.dumps(
            {
                "metric": "catalog_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
