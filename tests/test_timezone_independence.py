"""Timezone-independence of the event-time surface.

The driver evaluates catalog queries on ITS OWN SparkSession, whose
``spark.sql.session.timeZone`` we don't control. Every event-time
column is TIMESTAMP_NTZ (naive — sources/parquet.py), so formatting,
comparisons, and window bucketing must produce byte-identical output
whatever the session timezone is. These tests run ts-sensitive
catalog queries under a deliberately hostile timezone and assert the
results match the UTC run — the failure mode they pin: an accidental
cast to (timezone-adjusted) TIMESTAMP_LTZ sneaking into a plan.
"""

from __future__ import annotations

import pytest

from umn_eda_kafka_stream_processing_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"

# every catalog query whose output depends on event-time values
TS_QUERIES = (
    "hourly_event_type_counts",
    "events_occurred_total",
    "latest_event_by_user",
    "asof_latest_order_per_event",
    "sliding_event_type_counts",
    "session_event_counts",
    "first_week_event_counts",
)


def _rows(spark, name):
    df = REGISTRY[name].spark(spark, SF_DIR)
    return sorted(tuple(str(v) for v in row) for row in df.collect())


@pytest.mark.parametrize("name", TS_QUERIES)
def test_results_identical_under_hostile_timezone(spark, name):
    baseline = _rows(spark, name)
    original = spark.conf.get("spark.sql.session.timeZone")
    try:
        # UTC-12:00 class offset plus DST: maximally shifts any value
        # that accidentally routes through session-tz conversion
        spark.conf.set("spark.sql.session.timeZone", "Pacific/Kiritimati")
        shifted = _rows(spark, name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    assert shifted == baseline
