"""Market-basket pair growth at k=100 (r13 verdict task 7): the
closest-to-linear sf1 row (0.63× at k=10) and the one pairwise-
association shape in the catalog — one more decade tells whether the
C(w,2) per-order pair explosion stays bounded by the basket-width
cap or creeps super-linear.

Corpus: lineitem replicated k× with consistently shifted order keys
(the relational_scaling recipe — FK edges valid, basket WIDTH
distribution preserved exactly, basket COUNT grows k×; part keys
unshifted so the per-part support table stays |parts| rows while
counts grow k×, the 100 TB shape: facts grow, vocabulary doesn't).
Only lineitem is materialized (the query reads nothing else);
everything else symlinks. Best-of-2 timings after an sf0.001 warmup.

If the k=100 decade shows >1.0× linear, the fix is pushing the
support threshold into the pair-generation join (filter parts below
min-support BEFORE the orderkey self-join) — noted in the section so
the escape is on record next to the measurement.

Appends/refreshes the "## Market-basket pair growth" SCALING.md
section.

Usage: python tools/basket_scaling.py [k ...]   (default: 1 10 100)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".benchmarks", "basket")
MARK = "## Market-basket pair growth"

SYMLINKED = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "events",
    "documents",
    "embeddings",
)


def build_corpus(spark, k: int) -> str:
    out_dir = f"{OUT}/x{k}"
    if os.path.exists(f"{out_dir}/_built"):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    rep = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__rep")
    (
        li.select("*", rep)
        .withColumn(
            "l_orderkey", F.col("l_orderkey") + F.col("__rep") * max_ok
        )
        .drop("__rep")
        .repartition(max(8, min(64, k)))
        .write.mode("overwrite")
        .parquet(f"{out_dir}/lineitem.parquet")
    )
    for t in SYMLINKED:
        os.symlink(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    open(f"{out_dir}/_built", "w").write("ok")
    return out_dir


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark(app_name="basket_scaling")
    q = entrymod.queries()["market_basket_rules"]
    q(spark, "/root/testdata/sf0.001").count()  # warmup
    rows = []
    for k in ks:
        sf_dir = build_corpus(spark, k)
        samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            n = q(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        sec = min(samples)
        rows.append((k, sec, n))
        print(f"k={k}: {sec:.2f}s ({n} rows)")

    k0, s0 = rows[0][0], rows[0][1]
    lines = [
        MARK,
        "",
        "`tools/basket_scaling.py` — `market_basket_rules` over "
        "lineitem replicated with shifted order keys (basket-width "
        "distribution preserved, basket count ×k, part vocabulary "
        "fixed — the 100 TB shape). The pair stage is the orderkey "
        "self-join of the distinct (order, part) list: C(w,2) pairs "
        "per basket, width ≤ the TPC-H line cap, so pair volume must "
        "track baskets ~linearly. Best-of-2 after warmup:",
        "",
        "| k | sec | × linear vs k=1 | out rows |",
        "|---|---|---|---|",
    ]
    for k, sec, n in rows:
        ratio = (sec / s0) / (k / k0)
        lines.append(f"| {k} | {sec:.2f}s | {ratio:.2f}× | {n} |")
    lines += [
        "",
        "The k=100 decade found a REAL defect on its first run: the "
        "query localCheckpoint'ed the fact-sized distinct basket list "
        "(raw UnsafeRow copies in block-manager memory → executor OOM "
        "at 60 M rows); the fix is the SQL columnar `persist()` "
        "(compressed int columns, disk spill) — same reuse, "
        "cluster-safe storage. If a future decade crosses 1.0× "
        "linear, push the support threshold into pair generation "
        "(drop below-min-support parts BEFORE the self-join) — the "
        "Apriori pruning this query's top-25 output contract makes "
        "optional at current scales.",
    ]
    block = "\n".join(lines) + "\n"
    path = os.path.join(REPO, "SCALING.md")
    text = open(path).read()
    if MARK in text:
        head, rest = text.split(MARK, 1)
        nxt = rest.find("\n## ")
        tail = rest[nxt + 1 :] if nxt != -1 else ""
        text = head + block + tail
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(path, "w") as fh:
        fh.write(text)
    print(f"updated {path}")


if __name__ == "__main__":
    main()
