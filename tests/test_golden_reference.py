"""Parity against the reference's REAL golden artifact.

`/root/reference/merged_sensor_data_grouped.csv` (34,890 rows) is the
output of the reference's whole batch ETL (`data_collector.py:49`). The
raw KETI inputs are not shipped, so the pipeline can't be re-run from
scratch — but the golden file carries its own derivation invariants,
which exercise exactly our F1/F2/A2 conversions on real data:

  * `timestamp` is the MEAN of raw epoch timestamps within the minute,
    so it must floor back to `event_ts_min` (F1 epoch→ts + A2 minute
    truncation), and
  * `ts_min_bignt` must equal the epoch seconds of `event_ts_min` (F2).

Asserting both over all 34,890 rows checks our conversion semantics
against the reference's pandas implementation at full dataset scale.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources import (
    readers,
)

GOLDEN = "/root/reference/merged_sensor_data_grouped.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference golden file not present"
)

SCHEMA = (
    "event_ts_min timestamp, ts_min_bignt long, room string, "
    "timestamp double, co2 double, light double, temp double, "
    "humidity double, pir double"
)


@pytest.fixture(scope="module")
def golden(spark):
    return readers.read_delimited(spark, GOLDEN, schema=SCHEMA)


def test_golden_row_count_and_keys(golden):
    assert golden.count() == 34890
    # (minute, room) is the group-by key of the reference ETL, so it
    # should be unique — the shipped artifact carries exactly ONE
    # anomalous duplicate (room 776 @ 2013-08-26 03:03, two rows with
    # different mean timestamps), impossible from a single
    # per-room groupby run (data_collector.py:38) and therefore baked
    # into the file upstream. Pinned here as-is.
    assert golden.select("event_ts_min", "room").distinct().count() == 34889
    dup = (
        golden.groupBy("event_ts_min", "room")
        .count()
        .filter(F.col("count") > 1)
        .collect()
    )
    assert len(dup) == 1 and dup[0].room == "776"
    assert golden.select("room").distinct().count() == 51


def test_f1_a2_minute_floor_reproduces_event_ts_min(golden):
    """F1 (timestamp_seconds) + A2 (date_trunc minute) over the real
    mean-timestamp column must reproduce the reference's bucket column
    on every one of the 34,890 rows."""
    mismatches = golden.filter(
        F.date_trunc("minute", F.timestamp_seconds(F.col("timestamp")))
        != F.col("event_ts_min")
    ).count()
    assert mismatches == 0


def test_f2_epoch_reproduces_ts_min_bignt(golden):
    """F2 (ts→epoch long) over the bucket column must reproduce the
    reference's big-numeric twin column exactly."""
    mismatches = golden.filter(
        F.col("event_ts_min").cast("long") != F.col("ts_min_bignt")
    ).count()
    assert mismatches == 0


def test_golden_time_span_matches_survey(golden):
    lo, hi = golden.agg(
        F.min("event_ts_min"), F.max("event_ts_min")
    ).first()
    assert str(lo) == "2013-08-23 23:04:00"
    assert str(hi) == "2013-08-31 18:23:00"
