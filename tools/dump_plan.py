"""Dump `.explain("formatted")` for catalog queries to plans/rNN/.

    python tools/dump_plan.py <round_tag> <before|after> <query> [query ...]

Writes plans/<round_tag>/<query>_<before|after>.txt with the full
formatted physical plan of the frame the catalog function returns.
Note: store-census queries run their side-effecting setup (upserts,
cache builds) during construction — dumping their plan executes that
setup, which is fine (the dump is not a timing).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from umn_eda_kafka_stream_processing_spark.plans import REGISTRY
from umn_eda_kafka_stream_processing_spark.session import get_spark


def main() -> None:
    round_tag, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        round_tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    # raise the node-string cap so ReadSchema/PushedFilters don't
    # truncate mid-line (round-4 lesson: plan regexes must never
    # match across lines)
    spark.conf.set("spark.sql.maxMetadataStringLength", "600")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
