"""Skew-join evidence: how much does salting (or AQE skew handling) buy
when one hot key dominates a shuffle join?

Synthesizes a 10M-row fact table where ~70% of rows share ONE key (the
rest uniform over 100k keys) and a 100k-row dimension, then times the
same aggregate-over-join three ways:

  plain  — sort-merge join, AQE off: the hot key lands in one task;
           wall time = that straggler.
  salted — relational.salted_join (16 salts), AQE off: the hot key's
           rows spread over 16 tasks.
  aqe    — plain join with AQE skew-join splitting on.

Broadcast is disabled throughout (the dim fits under the default 10MB
threshold, which would dodge the skew entirely — at 100 TB it would
not). All three variants must agree on (row count, checksum); results
are appended to SCALING.md by hand from this script's JSON line.

Usage: python tools/skew_experiment.py [n_rows hot_frac]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    relational,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.7
N_DIM = 100_000


def build(spark: SparkSession):
    fact = spark.range(N).select(
        F.when(F.rand(1) < HOT_FRAC, F.lit(0))
        .otherwise((F.rand(2) * N_DIM).cast("long"))
        .alias("k"),
        (F.col("id") % 1000).alias("payload"),
    )
    dim = spark.range(N_DIM).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("dim_val")
    )
    return fact, dim


def run(join_df) -> tuple[float, int, int]:
    t0 = time.time()
    row = join_df.agg(
        F.count("*").alias("n"),
        F.sum(F.col("payload") + F.col("dim_val")).alias("checksum"),
    ).collect()[0]
    return time.time() - t0, row.n, row.checksum


def main() -> None:
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("skew-experiment")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    fact, dim = build(spark)
    fact.persist().count()  # materialize once so generation cost is shared
    dim.persist().count()

    results = {}
    t, n, c = run(fact.join(dim, "k"))
    results["plain_smj"] = {"sec": round(t, 2), "rows": n, "checksum": c}
    t, n2, c2 = run(relational.salted_join(fact, dim, ["k"], n_salts=16))
    results["salted_16"] = {"sec": round(t, 2), "rows": n2, "checksum": c2}
    assert (n, c) == (n2, c2), "salted join changed the result!"

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t, n3, c3 = run(fact.join(dim, "k"))
    results["aqe_skew"] = {"sec": round(t, 2), "rows": n3, "checksum": c3}
    assert (n, c) == (n3, c3), "aqe join changed the result!"

    print(json.dumps({"n_fact": N, "hot_frac": HOT_FRAC, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
