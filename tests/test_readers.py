"""Reader unit tests (S1/S3): headerless sensor CSV and custom-separator
delimited scans with explicit schemas."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_sensor_tree_datasource_matches_globbed_reader(spark, tmp_dir):
    """The Python DataSource connector (format('sensor_tree')) must
    return exactly what the production globbed-scan reader returns —
    same rows, same room attribution — with one task per room file
    (partition-parallel planning), and malformed lines must yield NULLs
    rather than fail the task."""
    import os

    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources.sensor_source import (
        SensorTreeDataSource,
    )

    root = f"{tmp_dir}/tree"
    series = {
        "room_a": [(1000.0, 21.5), (1060.0, 22.0)],
        "room_b": [(1000.0, 19.0)],
    }
    for room, rows in series.items():
        os.makedirs(f"{root}/{room}", exist_ok=True)
        with open(f"{root}/{room}/co2.csv", "w") as f:
            for ts, v in rows:
                f.write(f"{ts},{v}\n")
    # a malformed trailing line in one file
    with open(f"{root}/room_b/co2.csv", "a") as f:
        f.write("not_a_ts,not_a_value\n")

    spark.dataSource.register(SensorTreeDataSource)
    via_ds = (
        spark.read.format("sensor_tree")
        .option("path", root)
        .option("metric", "co2")
        .load()
    )
    assert via_ds.rdd.getNumPartitions() == 2  # one split per room file
    got = {
        (r.room, r.timestamp, r.co2)
        for r in via_ds.filter(F.col("timestamp").isNotNull()).collect()
    }
    want = {
        (r.room, r.timestamp, r.co2)
        for r in readers.read_sensor_tree(spark, root, "co2")
        .filter(F.col("timestamp").isNotNull())
        .collect()
    }
    assert got == want and len(got) == 3
    bad = via_ds.filter(F.col("timestamp").isNull()).collect()
    assert len(bad) == 1 and bad[0].co2 is None and bad[0].room == "room_b"


def test_sensor_tree_stream_tails_appended_lines(spark, tmp_dir):
    """Streaming connector: with a shared checkpoint, a restarted query
    must ingest ONLY lines appended since the committed offset — line-
    granularity tailing the built-in file stream can't do (it ingests
    whole new files, not in-place appends)."""
    import os

    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources.sensor_source import (
        SensorTreeDataSource,
    )

    root = f"{tmp_dir}/stree"
    os.makedirs(f"{root}/r1", exist_ok=True)
    with open(f"{root}/r1/co2.csv", "w") as f:
        f.write("1.0,10.0\n2.0,11.0\n")

    spark.dataSource.register(SensorTreeDataSource)
    ckpt = f"{tmp_dir}/stree_ckpt"
    out = f"{tmp_dir}/stree_out"

    def run():
        before = (
            {r[0] for r in spark.read.parquet(out).select("__b").collect()}
            if os.path.exists(f"{out}/_spark_metadata")
            else set()
        )
        q = (
            spark.readStream.format("sensor_tree")
            .option("path", root)
            .option("metric", "co2")
            .load()
            .withColumn("__b", F.lit(len(before)))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        df = spark.read.parquet(out).filter(~F.col("__b").isin(list(before)))
        return {(r.timestamp, r.co2, r.room) for r in df.collect()}

    first = run()
    assert first == {(1.0, 10.0, "r1"), (2.0, 11.0, "r1")}

    with open(f"{root}/r1/co2.csv", "a") as f:
        f.write("3.0,12.0\n")
    os.makedirs(f"{root}/r2", exist_ok=True)
    with open(f"{root}/r2/co2.csv", "w") as f:
        f.write("1.0,20.0\n")

    second = run()
    # same checkpoint → only the delta: the appended line + the new room
    assert second == {(3.0, 12.0, "r1"), (1.0, 20.0, "r2")}


def test_sensor_tree_stream_ignores_torn_lines_and_replays_offsets(
    spark, tmp_dir
):
    """Two reader-level contracts: (1) a newline-less torn tail is
    neither parsed nor consumed — the completed line is picked up whole
    later; (2) readBetweenOffsets re-derives exactly the committed
    batch's rows (restart recovery), bounded by the END offset even
    after more lines landed."""
    import os

    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources.sensor_source import (
        SensorTreeStreamReader,
    )

    root = f"{tmp_dir}/torn"
    os.makedirs(f"{root}/r1", exist_ok=True)
    with open(f"{root}/r1/co2.csv", "w") as f:
        f.write("1.0,10.0\n2.0,2")  # torn mid-append: no trailing newline

    r = SensorTreeStreamReader(root, "co2")
    rows1, off1 = r.read(r.initialOffset())
    assert list(rows1) == [(1.0, 10.0, "r1")]
    assert off1["consumed"] == {"r1": 1}  # torn line NOT consumed

    with open(f"{root}/r1/co2.csv", "a") as f:
        f.write("2.5\n")  # writer finishes the line: 2.0,22.5
    rows2, off2 = r.read(off1)
    assert list(rows2) == [(2.0, 22.5, "r1")]
    assert off2["consumed"] == {"r1": 2}

    # restart recovery: batch (off1 -> off2) re-derived exactly, even
    # though a third line has landed since
    with open(f"{root}/r1/co2.csv", "a") as f:
        f.write("3.0,30.0\n")
    assert list(r.readBetweenOffsets(off1, off2)) == [(2.0, 22.5, "r1")]


def test_read_table_cache_misses_on_regenerated_file(spark, tmp_dir):
    """The reader-handle cache is metadata-only and keyed on the
    table's (mtime, size) fingerprint: rewriting the parquet in place
    must MISS (fresh handle over the new file) while an untouched table
    HITS (same lazy handle object back). Also pins the bound: the
    module-level dict can never outgrow _TABLE_CACHE_MAX."""
    import os
    import shutil
    import time as _time

    sf = f"{tmp_dir}/sfx"
    os.makedirs(sf, exist_ok=True)

    def _write(rows):
        tmp = f"{tmp_dir}/stage"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(tmp)
        part = [p for p in os.listdir(tmp) if p.endswith(".parquet")][0]
        shutil.copyfile(f"{tmp}/{part}", f"{sf}/documents.parquet")

    _write([(1, "a")])
    h1 = readers.read_table(spark, sf, "documents")
    assert readers.read_table(spark, sf, "documents") is h1  # hit
    _time.sleep(0.05)
    _write([(1, "a"), (2, "b")])  # regenerate in place
    os.utime(f"{sf}/documents.parquet")  # ensure mtime moves even on
    # coarse-granularity filesystems
    h2 = readers.read_table(spark, sf, "documents")
    assert h2 is not h1, "regenerated table served a stale cached handle"
    assert h2.count() == 2
    assert len(readers._TABLE_CACHE) <= readers._TABLE_CACHE_MAX
