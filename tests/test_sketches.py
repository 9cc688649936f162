"""Count-min sketch: guarantees, mergeability, bounded state."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    sketches,
)


def _keyed(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], "k string")


def test_estimate_never_undercounts(spark):
    # skewed stream: "hot" 500×, others 1-50×
    rows = ["hot"] * 500 + [f"k{i}" for i in range(50) for _ in range(i + 1)]
    df = _keyed(spark, rows)
    sk = sketches.cms_build(df, "k", depth=4, width=64)
    exact = df.groupBy("k").agg(F.count("*").alias("exact_n"))
    est = sketches.cms_estimate(
        sk, exact.select("k"), "k", depth=4, width=64
    )
    joined = exact.join(est, "k").collect()
    assert len(joined) == 51
    for r in joined:
        assert r.cms_est >= r.exact_n, (r.k, r.cms_est, r.exact_n)


def test_heavy_hitter_exact_at_generous_width(spark):
    # width >> distinct keys → collisions unlikely per row, min() exact
    rows = ["hot"] * 100 + ["a", "b", "c"] * 3
    df = _keyed(spark, rows)
    sk = sketches.cms_build(df, "k", depth=4, width=1024)
    est = {
        r.k: r.cms_est
        for r in sketches.cms_estimate(
            sk, df.select("k").distinct(), "k", depth=4, width=1024
        ).collect()
    }
    assert est["hot"] == 100
    assert est["a"] == 3


def test_grid_is_bounded(spark):
    df = _keyed(spark, [f"key{i}" for i in range(5000)])
    sk = sketches.cms_build(df, "k", depth=4, width=32)
    assert sk.count() <= 4 * 32
    # every cell row id is in range
    bad = sk.filter(
        (F.col("r") < 0)
        | (F.col("r") >= 4)
        | (F.col("bucket") < 0)
        | (F.col("bucket") >= 32)
    ).count()
    assert bad == 0
    # total mass conserved: each row of the grid sums to N
    per_row = {r.r: r.s for r in sk.groupBy("r").agg(F.sum("n").alias("s")).collect()}
    assert set(per_row.values()) == {5000}


def test_merge_equals_whole(spark):
    rows = [f"k{i % 37}" for i in range(400)]
    a = sketches.cms_build(_keyed(spark, rows[:150]), "k", depth=4, width=64)
    b = sketches.cms_build(_keyed(spark, rows[150:]), "k", depth=4, width=64)
    merged = sketches.cms_merge(a, b)
    whole = sketches.cms_build(_keyed(spark, rows), "k", depth=4, width=64)
    diff = merged.exceptAll(whole).count() + whole.exceptAll(merged).count()
    assert diff == 0


def test_absent_key_estimates_small(spark):
    df = _keyed(spark, [f"k{i}" for i in range(20)])
    sk = sketches.cms_build(df, "k", depth=4, width=512)
    ghost = _keyed(spark, ["never-seen"])
    est = sketches.cms_estimate(sk, ghost, "k", depth=4, width=512).collect()
    # with 20 keys over 4×512 cells the min over 4 rows is almost surely 0
    assert est[0].cms_est == 0
