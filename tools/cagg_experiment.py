"""Continuous-aggregate scaling evidence: serving cost vs full rescan as
history grows, tail held constant.

Builds k× event histories (k in 1, 4, 16 by default) by unioning the
sf0.1 events table with same-time-span replicas — the event RATE grows
k× while the time span, bucket cardinality, and watermark stay fixed.
That is the hypertable regime: raw history is per-event, the rollup is
per-(minute, key), and the gap between those two sizes is exactly what
the materialization buys. (Deepening history with SPARSE events would
grow the rollup 1:1 with raw and buy nothing — the pattern's stated
precondition, not a finding.) Times two ways to answer the same
minute-rollup query:

  rescan  — GROUP BY over the full raw history (what every query pays
            without a continuous aggregate);
  serve   — materialized-history scan ∪ fresh-tail rollup
            (operators.rollup), i.e. raw data touched = tail only.

The materialization itself is timed separately (it is paid once, then
amortized over every serve). Expectation at 100 TB, verified here in
miniature: rescan grows linearly with history; serve cost tracks the
rollup's size (minutes × keys — orders of magnitude smaller than raw)
plus the constant tail. Appends a section to SCALING.md.

Usage: python tools/cagg_experiment.py [k ...]   (default: 1 4 16)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    rollup,
)

BASE = "/root/testdata/sf0.1/events.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchmarks",
    "cagg",
)
MARKER = "## Continuous-aggregate serving vs rescan"


def build_history(spark, k: int) -> str:
    """k× event rate over the SAME time span: replica i jitters each
    timestamp by (i % 30) seconds — replicas 30 apart collide exactly
    and a jitter can cross a minute boundary, neither of which matters
    here: what the experiment needs is raw rows growing k× while rollup
    cardinality stays bounded by span-minutes × keys (it does — the
    span is fixed), not bit-identical buckets per replica."""
    path = f"{OUT}/x{k}"
    if os.path.exists(f"{path}/_SUCCESS"):
        return path
    base = spark.read.parquet(BASE).select(
        F.col("ts").cast("timestamp").alias("ts"), "event_type", "value"
    )
    parts = [
        base.withColumn(
            "ts", F.col("ts") + F.expr(f"INTERVAL {i % 30} SECONDS")
        )
        for i in range(k)
    ]
    hist = parts[0]
    for p in parts[1:]:
        hist = hist.unionByName(p)
    # day-partitioned landing layout (S5) — what makes the tail scan
    # prunable to the newest day's directory
    hist.withColumn("dt", F.to_date("ts")).write.mode(
        "overwrite"
    ).partitionBy("dt").parquet(path)
    return path


def timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="cagg-experiment")
    rows = []
    for k in ks:
        hist_path = build_history(spark, k)
        raw = spark.read.parquet(hist_path)
        n_raw = raw.count()

        def rescan():
            rollup.minute_rollup_frame(raw).count()

        t_rescan = min(timed(rescan), timed(rescan))

        mat_path = f"{OUT}/mat_x{k}"
        shutil.rmtree(mat_path, ignore_errors=True)
        w = rollup.materialization_watermark(raw)
        t_mat = timed(lambda: rollup.materialize_history(raw, mat_path, w))

        def serve():
            rollup.continuous_aggregate(
                spark, raw, mat_path, w, partition_col="dt"
            ).count()

        t_serve = min(timed(serve), timed(serve))
        rows.append((k, n_raw, t_rescan, t_mat, t_serve))
        print(f"x{k}: raw={n_raw} rescan={t_rescan:.2f}s "
              f"materialize={t_mat:.2f}s serve={t_serve:.2f}s", flush=True)

    lines = [
        MARKER,
        "",
        "Event rate grows k× over a fixed time span (the hypertable",
        "regime: raw is per-event, the rollup is per-minute-bucket).",
        "`rescan` aggregates the full raw history per query; `serve`",
        "reads the day-partitioned materialized rollup and aggregates",
        "only the raw tail (`operators/rollup.py`). The materialization",
        "is a one-time cost amortized over every serve.",
        "",
        "| k | raw rows | rescan/query | materialize (once) | serve/query |",
        "|---|---|---|---|---|",
    ]
    r1 = rows[0]
    for k, n, tr, tm, ts_ in rows:
        lines.append(
            f"| {k}× | {n:,} | {tr:.2f}s ({tr / r1[2]:.1f}×) | {tm:.2f}s "
            f"| {ts_:.2f}s ({ts_ / r1[4]:.1f}×) |"
        )
    lines.append("")

    scaling_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    text = open(scaling_md).read() if os.path.exists(scaling_md) else ""
    # drop EVERY prior copy of the section (up to the next "## " or EOF)
    while MARKER in text:
        head, _, rest = text.partition(MARKER)
        tail_idx = rest.find("\n## ")
        text = head + (rest[tail_idx + 1:] if tail_idx >= 0 else "")
    with open(scaling_md, "w") as f:
        f.write(text.rstrip("\n") + ("\n\n" if text.strip() else "")
                + "\n".join(lines))
    print(f"wrote section to {scaling_md}")


if __name__ == "__main__":
    main()
