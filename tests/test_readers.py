"""Reader unit tests (S1/S3): headerless sensor CSV and custom-separator
delimited scans with explicit schemas."""

from __future__ import annotations

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources import (
    readers,
)


def test_read_sensor_csv_headerless(spark, tmp_dir):
    p = f"{tmp_dir}/co2.csv"
    with open(p, "w") as f:
        f.write("1377299093.0,415.0\n1377299125.0,430.5\n")
    df = readers.read_sensor_csv(spark, p, "co2")
    assert df.columns == ["timestamp", "co2"]
    rows = sorted((r.timestamp, r.co2) for r in df.collect())
    assert rows == [(1377299093.0, 415.0), (1377299125.0, 430.5)]


def test_read_delimited_custom_sep_and_schema(spark, tmp_dir):
    p = f"{tmp_dir}/data.psv"
    with open(p, "w") as f:
        f.write("id|name|score\n1|alpha|2.5\n2|beta|\n")
    df = readers.read_delimited(
        spark, p, sep="|", schema="id BIGINT, name STRING, score DOUBLE"
    )
    rows = sorted((r.id, r.name, r.score) for r in df.collect())
    assert rows == [(1, "alpha", 2.5), (2, "beta", None)]
