"""Relational-core scaling evidence: join/aggregate wall growth as the
fact tables multiply, dimensions held constant.

Replicates lineitem/orders k× (new synthetic keys per replica: orderkeys
offset by k·10⁹ so join fan-out per key is UNCHANGED — naive duplication
would multiply matches per key and measure quadratic join output, not
engine scaling). Times the three headline relational shapes:

  tpch_q1   — scan-heavy single-exchange aggregate
  multiway  — 5-table join chain (dims broadcast) + agg
  q18       — aggregate-then-join (HAVING rewrite)

Appends a section to SCALING.md. Usage:
    python tools/relational_scaling.py [k ...]    (default: 1 4 16)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchmarks",
    "relscale",
)
MARKER = "## Relational-core scaling (fact tables k×, dims constant)"
TIMED = [
    "tpch_q1_pricing_summary",
    "multiway_join_revenue",
    "tpch_q18_large_orders",
    # round-4 shapes: 6-table join with a non-join residual equality
    # (Q5) and the broadcast-part profit rollup (Q9) — fact volume
    # multiplies while every dim stays broadcast
    "tpch_q5_local_supplier_volume",
    "tpch_q9_product_type_profit",
]


def build(spark, k: int) -> str:
    out_dir = f"{OUT}/x{k}"
    if os.path.exists(f"{out_dir}/_built"):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for t, keycols in (
        ("lineitem", ["l_orderkey"]),
        ("orders", ["o_orderkey"]),
    ):
        base = spark.read.parquet(f"{BASE}/{t}.parquet")
        parts = []
        for i in range(k):
            p = base
            for c in keycols:
                p = p.withColumn(c, F.col(c) + F.lit(i * 1_000_000_000))
            parts.append(p)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
    # dimensions unchanged — symlink them
    for t in ("customer", "supplier", "part", "nation", "region",
              "events", "documents", "embeddings"):
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    open(f"{out_dir}/_built", "w").close()
    return out_dir


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="relational-scaling")
    qs = entrymod.queries()
    rows = []
    for k in ks:
        sf_dir = build(spark, k)
        times = {}
        for name in TIMED:
            qs[name](spark, sf_dir).count()  # warm the io/codegen path
            reps = []
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                reps.append(time.time() - t0)
            times[name] = min(reps)
        rows.append((k, times))
        print(f"x{k}: " + " ".join(f"{n}={t:.2f}s" for n, t in times.items()),
              flush=True)

    r1 = rows[0][1]
    kmax = rows[-1][0]
    data_ratio = rows[-1][0] / rows[0][0]
    max_rows_m = 0.6 * kmax
    lines = [
        MARKER,
        "",
        "lineitem/orders replicated k× with per-replica key offsets (join",
        "fan-out per key unchanged; dims constant and still broadcast).",
        f"sf0.1 base: 600k lineitem rows → {kmax}× = "
        f"{max_rows_m:.0f}M. Best of 2 per cell.",
        "At the top scale the single-exchange Q1 aggregate stays",
        "scan-bound; the join shapes grow with shuffle volume but far",
        "under linear — broadcast dims mean the only exchanged data is",
        "the fact side's join keys + aggregation partials.",
        "",
        "| query | " + " | ".join(f"k={k}" for k, _ in rows)
        + " | growth vs data |",
        "|---|" + "---|" * (len(rows) + 1),
    ]
    for name in TIMED:
        cells = " | ".join(f"{t[name]:.2f}s" for _, t in rows)
        ratio = rows[-1][1][name] / r1[name] / data_ratio
        lines.append(f"| {name} | {cells} | {ratio:.2f}× linear |")
    lines.append("")

    scaling_md = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING.md",
    )
    text = open(scaling_md).read() if os.path.exists(scaling_md) else ""
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
