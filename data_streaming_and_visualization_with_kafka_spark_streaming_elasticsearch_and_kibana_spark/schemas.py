"""Canonical record schemas — single source of truth.

The reference hard-codes two *divergent* StructTypes for the same wire
record (consumer A: 7 fields, `timestamp` STRING —
`spark_streaming_kafka.py:21-29`; consumer B: 8 fields, adds
`event_ts_min`, `timestamp` LONG — `kafka_to_es.py:25-34`). The engine
keeps both as named variants of one registry so the divergence is an
explicit choice, not an accident.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Sensor metrics fused by the reference ETL (data_collector.py:16-20).
SENSOR_METRICS = ("co2", "light", "temp", "humidity", "pir")

#: Consumer-A record (spark_streaming_kafka.py:21-29): 7 fields, ts as string.
SENSOR_RECORD_A = T.StructType(
    [T.StructField("timestamp", T.StringType(), True),
     T.StructField("room", T.StringType(), True)]
    + [T.StructField(m, T.FloatType(), True) for m in SENSOR_METRICS]
)

#: Consumer-B record (kafka_to_es.py:25-34): 8 fields, epoch-seconds long.
SENSOR_RECORD_B = T.StructType(
    [T.StructField("event_ts_min", T.StringType(), True),
     T.StructField("timestamp", T.LongType(), True),
     T.StructField("room", T.StringType(), True)]
    + [T.StructField(m, T.FloatType(), True) for m in SENSOR_METRICS]
)

#: Raw per-sensor 2-column file (data_collector.py:16-20): headerless CSV.
def sensor_raw_schema(metric: str) -> T.StructType:
    return T.StructType(
        [T.StructField("timestamp", T.DoubleType(), True),
         T.StructField(metric, T.DoubleType(), True)]
    )

#: Fused wide table (merged_sensor_data_grouped.csv header; data_collector.py:49).
SENSOR_FUSED = T.StructType(
    [T.StructField("event_ts_min", T.TimestampType(), True),
     T.StructField("ts_min_bignt", T.LongType(), True),
     T.StructField("room", T.StringType(), True),
     T.StructField("timestamp", T.DoubleType(), True)]
    + [T.StructField(m, T.DoubleType(), True) for m in SENSOR_METRICS]
)

#: Driver test tables (/root/testdata/sf*/ — TESTDATA.md).
TEST_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
