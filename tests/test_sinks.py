"""Sink plumbing tests — everything testable without a broker/cluster:
ES option construction (keyed upsert, dynamic index routing), the bulk
foreachBatch bridge shape, and the partitioned-parquet layout."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources import (
    sinks,
)


def test_es_writer_options_keyed_upsert():
    opts = sinks.es_writer_options("office-index/_doc", mapping_id="room")
    assert opts["es.resource"] == "office-index/_doc"
    assert opts["es.mapping.id"] == "room"  # S8: doc id = room → last-write-wins
    assert opts["es.nodes"] == "localhost" and opts["es.port"] == "9200"


def test_es_writer_options_dynamic_index_routing():
    # S9: the connector's {field} pattern replaces per-row Python HTTP calls
    opts = sinks.es_writer_options("room-{room}")
    assert opts["es.resource"] == "room-{room}"
    assert "es.mapping.id" not in opts


def test_es_bulk_foreach_batch_returns_callable():
    fn = sinks.es_bulk_foreach_batch(lambda d: f"room-{d['room']}", id_field="room")
    assert callable(fn)


def test_write_partitioned_parquet_layout(spark, tmp_dir):
    df = spark.createDataFrame(
        [("2024-01-01", "a", 1.0), ("2024-01-01", "b", 2.0), ("2024-01-02", "a", 3.0)],
        "dt STRING, room STRING, v DOUBLE",
    )
    path = f"{tmp_dir}/fused"
    sinks.write_partitioned_parquet(df, path, ["dt"])
    assert sorted(
        d for d in os.listdir(path) if d.startswith("dt=")
    ) == ["dt=2024-01-01", "dt=2024-01-02"]
    back = spark.read.parquet(path)
    assert back.count() == 3
    # partition pruning: reading one dt touches one partition dir
    pruned = back.filter(F.col("dt") == "2024-01-02")
    assert pruned.count() == 1


def test_kafka_stream_writer_builds(spark, tmp_dir):
    # no broker in the container — assert the writer is configured and
    # carries a per-query checkpoint (T2 fix), not the reference's shared dir
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("CAST(value AS STRING) AS key", "CAST(value AS STRING) AS value")
    )
    w = sinks.kafka_stream_writer(
        stream, "localhost:9092", "office-input", checkpoint=f"{tmp_dir}/ckpt"
    )
    assert w is not None  # DataStreamWriter built with kafka format + options
