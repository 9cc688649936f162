"""Continuous-aggregate (hypertable rollup) semantics — operators.rollup.

Pins the two load-bearing claims: (1) materialized history ∪ fresh tail
equals the full rollup exactly (the day/minute disjointness argument);
(2) the materialized layout is partitioned by day, so a late-data
refresh touches one directory.
"""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    rollup,
)


def _events(spark, n=500):
    base = datetime.datetime(2024, 1, 1)
    return spark.range(n).select(
        (F.lit(base) + F.make_interval(mins=(F.col("id") * 7) % 4000)).alias(
            "ts"
        ),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias(
            "event_type"
        ),
        ((F.col("id") % 100) / 10.0).alias("value"),
    )


def test_history_plus_tail_equals_full_rollup(spark, tmp_dir):
    ev = _events(spark)
    path = os.path.join(tmp_dir, "cagg")
    got = rollup.ensure_materialized(spark, ev, path)
    full = rollup.minute_rollup_frame(ev)
    assert got.count() == full.count()
    assert (
        got.exceptAll(full).count() == 0 and full.exceptAll(got).count() == 0
    )


def test_materialized_layout_is_day_partitioned(spark, tmp_dir):
    ev = _events(spark)
    path = os.path.join(tmp_dir, "cagg")
    rollup.ensure_materialized(spark, ev, path)
    dt_dirs = [d for d in os.listdir(path) if d.startswith("dt=")]
    # 4000 minutes ≈ 2.8 days; watermark cuts the last partial day to the
    # tail, leaving at least the first two full days materialized
    assert len(dt_dirs) >= 2


def test_tail_reads_only_post_watermark_rows(spark, tmp_dir):
    ev = _events(spark)
    path = os.path.join(tmp_dir, "cagg")
    w = rollup.materialization_watermark(ev)
    rollup.materialize_history(ev, path, w)
    hist = spark.read.parquet(path)
    # nothing at-or-after the watermark is materialized
    assert hist.filter(F.col("minute") >= F.lit(w)).count() == 0
    # and the union still accounts for every raw row
    agg = rollup.continuous_aggregate(spark, ev, path, w)
    assert agg.agg(F.sum("n")).head()[0] == ev.count()


def test_tail_scan_prunes_day_partitions(spark, tmp_dir):
    """With a day-partitioned landing table and partition_col set, the
    tail side of the serve plan must carry the watermark as a
    PartitionFilter on dt — directory pruning, not row filtering."""
    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.plans.explain import (
        formatted_plan,
    )

    ev = _events(spark)
    land = os.path.join(tmp_dir, "land")
    ev.withColumn("dt", F.to_date("ts")).write.partitionBy("dt").parquet(land)
    raw = spark.read.parquet(land)
    w = rollup.materialization_watermark(raw)
    mat = os.path.join(tmp_dir, "cagg")
    rollup.materialize_history(raw, mat, w)
    served = rollup.continuous_aggregate(
        spark, raw, mat, w, partition_col="dt"
    )
    plan = formatted_plan(served)
    # the landing-table scan (the one over `land`) must show a dt bound
    assert any(
        "PartitionFilters" in s and "dt" in s.split("PartitionFilters")[1][:200]
        for s in plan.split("Scan parquet") if "land" in s[:800]
    ), plan[:1500]
    # and the union still equals the full rollup
    full = rollup.minute_rollup_frame(raw)
    assert served.exceptAll(full).count() == 0
    assert full.exceptAll(served).count() == 0


def test_frozen_watermark_covers_late_arriving_days(spark, tmp_dir):
    """Regression: ensure_materialized must reuse the watermark FROZEN at
    materialization time. Recomputing it from live data would drop every
    day that arrived between the old and new max(ts) — they'd be past
    the frozen history AND before the recomputed watermark."""
    ev1 = _events(spark, 300)  # spans ~1.5 days from 2024-01-01
    path = os.path.join(tmp_dir, "cagg")
    got1 = rollup.ensure_materialized(spark, ev1, path)
    assert got1.agg(F.sum("n")).head()[0] == 300
    # two more days of data arrive AFTER materialization
    ev2 = _events(spark, 500)
    got2 = rollup.ensure_materialized(spark, ev2, path)
    assert got2.agg(F.sum("n")).head()[0] == 500  # nothing dropped


def test_backfill_days_repairs_corrupted_partition(spark, tmp_dir):
    """backfill_days must restore exactly the named day partitions from
    raw facts: after corrupting one materialized day (dropping half its
    rows and garbling the rest), backfilling that single day makes the
    served continuous aggregate equal the full recompute again — and
    the other day directories' files are untouched (mtime-identical),
    proving dynamic partition overwrite rewrote only the repair set."""
    ev = _events(spark)
    path = os.path.join(tmp_dir, "cagg_bf")
    rollup.ensure_materialized(spark, ev, path).count()

    days = sorted(
        d
        for d in os.listdir(path)
        if d.startswith("dt=") and os.path.isdir(os.path.join(path, d))
    )
    assert len(days) >= 2
    victim = days[0]
    victim_date = datetime.date.fromisoformat(victim.split("=", 1)[1])
    other_files = {
        (f, os.path.getmtime(os.path.join(path, days[1], f)))
        for f in os.listdir(os.path.join(path, days[1]))
    }

    # corrupt the victim: halve and garble its rows
    vdir = os.path.join(path, victim)
    broken = (
        spark.read.parquet(vdir)
        .limit(3)
        .withColumn("value_cents", F.col("value_cents") * 999)
    )
    broken.write.mode("overwrite").parquet(vdir + ".tmp")
    import shutil

    shutil.rmtree(vdir)
    os.replace(vdir + ".tmp", vdir)

    import json

    meta = json.load(open(os.path.join(path, "_CAGG_META")))
    wm = datetime.datetime.fromisoformat(meta["watermark"])
    before = rollup.continuous_aggregate(spark, ev, path, wm)
    full = rollup.minute_rollup_frame(ev)
    assert before.exceptAll(full).count() > 0  # corruption is visible

    rollup.backfill_days(spark, ev, path, [victim_date])
    after = rollup.continuous_aggregate(spark, ev, path, wm)
    assert (
        after.exceptAll(full).count() == 0
        and full.exceptAll(after).count() == 0
    )
    # untouched day partition: same files, same mtimes
    assert other_files == {
        (f, os.path.getmtime(os.path.join(path, days[1], f)))
        for f in os.listdir(os.path.join(path, days[1]))
    }


def test_backfill_rejects_days_at_or_above_the_watermark(spark, tmp_dir):
    """Materializing the tail day would double-count it in history ∪
    tail; backfill_days must refuse."""
    import pytest

    ev = _events(spark)
    path = os.path.join(tmp_dir, "cagg_guard")
    rollup.ensure_materialized(spark, ev, path).count()
    import json

    wm = datetime.datetime.fromisoformat(
        json.load(open(os.path.join(path, "_CAGG_META")))["watermark"]
    )
    with pytest.raises(ValueError, match="not below the frozen watermark"):
        rollup.backfill_days(spark, ev, path, [wm.date()])


def test_continuous_aggregate_resolves_mid_swap_leftovers(spark, tmp_dir):
    """A refresh writer crash between os.replace and .old cleanup
    leaves dt=<day>.old beside the live partition; partition discovery
    would double-count the retired copy. The serving read must resolve
    the leftover first and return the exact rollup."""
    import json
    import shutil

    ev = _events(spark)
    path = os.path.join(tmp_dir, "cagg_swap")
    rollup.ensure_materialized(spark, ev, path).count()
    days = [d for d in os.listdir(path) if d.startswith("dt=")]
    victim = os.path.join(path, days[0])
    shutil.copytree(victim, victim + ".old")  # simulate the crash window

    wm = datetime.datetime.fromisoformat(
        json.load(open(os.path.join(path, "_CAGG_META")))["watermark"]
    )
    got = rollup.continuous_aggregate(spark, ev, path, wm)
    full = rollup.minute_rollup_frame(ev)
    assert (
        got.exceptAll(full).count() == 0
        and full.exceptAll(got).count() == 0
    )
    assert not os.path.exists(victim + ".old")  # leftover resolved
