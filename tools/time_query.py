"""Time individual catalog queries with the noop sink (guide §1.4).

    python tools/time_query.py [--runs N] [--sf DIR] <query> [query ...]

One shared session, one trivial warmup query first (JVM/codegen), then
per query: N noop-sink runs (run 0 is the recorded warmup, excluded
from the median — it pays train-once session-cache builds). Prints
walls per run plus the post-warmup median. Persisted RDDs are swept
between runs, mirroring bench.py, so session caches rebuilt per run
don't accumulate and medians stay comparable with BENCH_DETAIL.
"""

from __future__ import annotations

import gc
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umn_eda_kafka_stream_processing_spark.plans import REGISTRY
from umn_eda_kafka_stream_processing_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    unknown = [n for n in names if n not in REGISTRY]
    if unknown or not names:
        print(f"usage: time_query.py [--runs N] [--sf DIR] query...; unknown={unknown}")
        raise SystemExit(2)
    spark = get_spark(app_name="time-query")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["user_event_count"].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    for name in names:
        spec = REGISTRY[name]
        walls = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run{r}")
            t0 = time.time()
            spec.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
            persisted = spark.sparkContext._jsc.getPersistentRDDs()
            if persisted:
                gc.collect()
                for jrdd in persisted.values():
                    jrdd.unpersist()
                spark.sparkContext._jvm.System.gc()
        med = statistics.median(walls[1:]) if len(walls) > 1 else walls[0]
        print(
            f"{name}: walls={[round(w, 2) for w in walls]} "
            f"median_post_warmup={med:.2f}s"
        )


if __name__ == "__main__":
    main()
