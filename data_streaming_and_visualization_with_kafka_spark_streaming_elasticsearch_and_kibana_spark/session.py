"""SparkSession factory.

Scale posture: every config here is chosen so the same code runs on
``local[32]`` for tests and on a 1000-executor cluster unchanged —
AQE handles runtime partition coalescing / skew splitting, session
timezone is pinned UTC for reproducible timestamp semantics (and
DuckDB-oracle parity), and Arrow is on for the (rare) Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sensor-analytics-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    On a real cluster ``master``/memory come from spark-submit; local
    defaults target the test harness (local[N], N from SPARK_GRAFT_CPUS).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Shuffle partitions: ~cores locally; AQE coalesces at runtime so a
    # higher static value is safe on big inputs.
    nshuffle = shuffle_partitions or int(cpus if str(cpus).isdigit() else 32)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(nshuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # legacy-generation test parquet stored TIMESTAMP(NANOS) — read
        # as long and convert explicitly (sources.readers.read_table)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
