"""Batch & streaming sources.

Covers SURVEY §2.1 S1-S4/S6: schema'd CSV (headerless per-sensor files),
directory-tree scan with the room dimension extracted from the path,
delimited CSV, Parquet, and the Kafka streaming source with pluggable
wire-format decode.

Scale notes: the reference's per-room Python loop (S2,
data_collector.py:11-13) becomes ONE globbed scan — Spark lists and
splits files in parallel, and `input_file_name()` recovers the room
dimension without driver-side iteration. Schemas are always explicit
(never inferSchema) so scans are single-pass and pushdown-friendly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import sensor_raw_schema


def read_sensor_csv(spark: SparkSession, path: str, metric: str) -> DataFrame:
    """S1: headerless 2-column `(timestamp, <metric>)` CSV
    (data_collector.py:16-20), schema declared up front."""
    return spark.read.schema(sensor_raw_schema(metric)).csv(path)


def read_sensor_tree(
    spark: SparkSession, root: str, metric: str, room_pattern: str = r"([^/]+)/[^/]+$"
) -> DataFrame:
    """S2: whole KETI-style tree in one scan — `root/*/<metric>.csv`,
    room recovered from the file path (replaces the reference's
    os.listdir loop with a parallel multi-file scan)."""
    df = spark.read.schema(sensor_raw_schema(metric)).csv(f"{root}/*/{metric}.csv")
    return df.withColumn(
        "room", F.regexp_extract(F.input_file_name(), room_pattern, 1)
    )


def read_delimited(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    schema: T.StructType | str | None = None,
) -> DataFrame:
    """S3 (dataframe_to_kafka.py:58-60) with explicit schema preferred."""
    r = spark.read.option("sep", sep).option("header", header)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)  # dev convenience only
    return r.csv(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S4 — the engine's canonical batch format (columnar, pushdown,
    partition pruning)."""
    return spark.read.parquet(path)


#: Timestamp columns whose parquet encoding has varied across testdata
#: generations: TIMESTAMP(NANOS) (read as long under nanosAsLong, converted
#: below) or TIMESTAMP(MICROS)/NTZ (read natively; no conversion fires).
NANOS_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


#: lazy reader-handle cache: (session id, path, mtime, size) → DataFrame.
#: This caches METADATA ONLY — the file listing + parquet footer schema
#: that `spark.read.parquet` re-resolves through the JVM on every call
#: (~50-100 ms each; a multi-table query paid ~1 s just re-listing the
#: same immutable files, and a bench run re-lists every table for every
#: sample). A DataFrame is an immutable lazy plan: every action still
#: scans the parquet bytes, so no result or intermediate is ever reused
#: — this is exactly the behavior a catalog table (metastore) gives a
#: production cluster, cf. guide §6 file-listing caching. Keyed on
#: (mtime, size) so a regenerated table invalidates. Hardened r16
#: (VERDICT r15 item 8 / ADVICE): bounded FIFO (a long-lived process
#: touching many sf_dirs/sessions can no longer grow it without limit,
#: and a stopped session's handles age out instead of pinning the
#: session forever), and directory-shaped tables stat their PART FILES
#: (a directory's mtime only moves on entry add/remove/rename, so an
#: in-place part rewrite would have served a stale listing).
_TABLE_CACHE: "dict" = {}
_TABLE_CACHE_MAX = 256


def _table_stat_key(path: str) -> tuple:
    """(mtime, size) fingerprint that sees in-place rewrites: for a
    single-file table the file's own stat; for a directory table the
    (name, mtime, size) of every direct entry (part files, _SUCCESS)."""
    st = os.stat(path)
    if not os.path.isdir(path):
        return (st.st_mtime, st.st_size)
    entries = tuple(
        (e.name, e.stat().st_mtime, e.stat().st_size)
        for e in sorted(os.scandir(path), key=lambda e: e.name)
    )
    return (st.st_mtime, entries)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Driver test-table loader (TESTDATA.md).

    Session-independent and encoding-agnostic: older testdata generations
    stored `events.ts` as TIMESTAMP(NANOS) (→ read as long under the
    legacy conf, converted to micros below); current ones store
    TIMESTAMP(MICROS) with isAdjustedToUTC=false (→ TIMESTAMP_NTZ, left
    as-is — downstream epoch math routes through `.cast("timestamp")`,
    see `_epoch_sec` in __spark_entry__). The session timezone is pinned
    UTC so date_trunc semantics match the tz-naive DuckDB oracle on ANY
    caller-supplied session, not just get_spark()'s.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    key = (id(spark), path, _table_stat_key(path))
    hit = _TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    df = spark.read.parquet(path)
    for c in NANOS_TS_COLS.get(name, []):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    while len(_TABLE_CACHE) >= _TABLE_CACHE_MAX:  # bounded: FIFO evict
        _TABLE_CACHE.pop(next(iter(_TABLE_CACHE)))
    _TABLE_CACHE[key] = df
    return df


# ----------------------------------------------------------------- streaming
def kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
):
    """S6 Kafka source (spark_streaming_kafka.py:13-18) with the
    backpressure knob the reference lacked (its throttle was
    sleep-per-row, O2 — here it's maxOffsetsPerTrigger, the principled
    version).

    Requires the spark-sql-kafka package on the classpath; raises a
    clear error otherwise (no broker/jar in the test container).
    """
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger:
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return r.load()


def file_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
):
    """File-drop streaming source — stands in for Kafka in tests and is a
    real production source for landed files."""
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.load(path)
