"""Cross-modal dedup scaling witness (r13 verdict task 6): the only
r13 debut with no growth row — its gated fixture is capped at
doc_id < 150 — so this harness grows the quad-modal corpus k× via the
perceptual-harness pattern and times the REAL gated operator body
(`__spark_entry__._cross_modal_census` over `_cross_modal_items` —
the exact legs + component recursion + election the driver gates).

Corpus construction: k replica blocks of the 150-doc base slice, each
replica salting EVERY WORD of `text` with its replica id — a trailing
suffix is invisible to 3-word shingles (every replica pair of the
same doc keeps Jaccard ≈ 1 and the text leg glues all blocks into k²
cross-replica pairs, measured before this fix), while a per-word salt
diverges every shingle, every md5 chain (image PGMs, audio WAVs), and
keeps each block's twin structure intact (30 text + 30 image + 30
embed + 30 audio twins per block — duplicate volume per unit of
corpus constant; the harness measures engine scaling, not pair-output
growth). Embeddings are md5-derived per (doc, replica) — identical
text → identical vector (the planted embed twin's cosine-1 contract),
distinct across docs/replicas with cosine concentrated near 0, so no
cross-replica pairs glue components together (per-column F.rand
streams correlate; hashing does not).

The stated risk is the min-label CC loop: legs are banded/
pigeonholed/cell-bucketed (~linear pair generation), but pointer
jumping runs O(log max-component) rounds — planted components stay
size ≤ 2 here and in any honestly deduped corpus slice, so rounds
must stay CONSTANT as k grows. Best-of-2 timings after a k=1 warmup.

Rewrites the "## Cross-modal dedup scaling" section of SCALING.md.

Usage: python tools/cross_modal_scaling.py [k ...]   (default: 1 4 16)
"""

from __future__ import annotations

import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.1"
MARK = "## Cross-modal dedup scaling"
BLOCK = 150  # the gated fixture's doc slice, replicated per block
STRIDE = 5_000  # id spacing between replica blocks (> 150 + 4*1000)


def _gen_emb(it):
    """md5-derived 64-dim embedding per row: identical text → identical
    vector, otherwise decorrelated (components are digest bytes mapped
    to [-1, 1))."""
    import hashlib

    import pandas as pd

    for pdf in it:
        out = []
        for t in pdf["text"]:
            comps: list[float] = []
            for j in range(4):
                dig = hashlib.md5(f"{t}#emb{j}".encode()).digest()
                comps.extend(b / 128.0 - 1.0 for b in dig)
            out.append(comps)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "v": out})


def grown_items(spark, k: int):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < BLOCK)
        .select("doc_id", "text")
    )
    frames = []
    for r in range(k):
        dr = docs.select(
            (F.col("doc_id") + r * STRIDE).alias("doc_id"),
            F.regexp_replace(
                F.col("text"), r"(\S+)", f"$1r{r}"
            ).alias("text"),
        )
        emb = dr.mapInPandas(_gen_emb, "doc_id long, v array<double>")
        b = entrymod._cross_modal_base(dr, emb)
        lo = r * STRIDE
        frames.append(
            entrymod._cross_modal_items(
                b, lo + 30, lo + 60, lo + 90, lo + 120, 1_000
            )
        )
    return reduce(
        lambda a, c: a.unionByName(c), frames
    ).localCheckpoint(eager=True)


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="cross_modal_scaling")
    # warmup: full census once at k=1 (JVM + codegen + Arrow paths)
    entrymod._cross_modal_census(grown_items(spark, 1)).count()
    rows = []
    for k in ks:
        items = grown_items(spark, k)
        n_items = items.count()
        samples, census = [], None
        for _ in range(2):
            t0 = time.perf_counter()
            census = entrymod._cross_modal_census(items).collect()
            samples.append(time.perf_counter() - t0)
        sec = min(samples)
        n_comp = len(census)
        n_pairs = sum(
            int(r.n_text + r.n_image + r.n_embed + r.n_audio)
            for r in census
        )
        rows.append((k, n_items, n_comp, n_pairs, sec))
        print(
            f"k={k}: {n_items} items, {n_comp} components, "
            f"{n_pairs} pairs, {sec:.2f}s"
        )

    k0, s0 = rows[0][0], rows[0][4]
    lines = [
        MARK,
        "",
        "`tools/cross_modal_scaling.py` — the REAL gated census body "
        "(`_cross_modal_census`: four bucketed legs, min-label "
        "components, quality election) over k replica blocks of the "
        "150-doc quad-modal fixture (replica-salted text → every "
        "authored chain diverges across blocks; md5-derived "
        "embeddings keep the cosine-1 twin contract without "
        "cross-replica glue; per-block twin structure constant). "
        "Best-of-2 after warmup:",
        "",
        "| k | items | components | planted+incidental pairs | sec | "
        "× linear |",
        "|---|---|---|---|---|---|",
    ]
    for k, n_items, n_comp, n_pairs, sec in rows:
        ratio = (sec / s0) / (k / k0)
        lines.append(
            f"| {k} | {n_items:,} | {n_comp:,} | {n_pairs:,} | "
            f"{sec:.2f}s | {ratio:.2f}× |"
        )
    lines += [
        "",
        "Components stay size-bounded (planted twins, no cross-replica "
        "edges), so the CC pointer-jumping round count is constant and "
        "the census tracks the bucketed legs' ~linear pair generation "
        "— the shape that survives a 100 TB corpus where component "
        "diameter, not corpus size, drives the loop depth.",
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
