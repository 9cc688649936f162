"""Scaling evidence for semantic dedup: does wall-time stay linear as
the embedding corpus grows, with the quantizer k growing alongside it
(the SemDeDup tractability contract — cluster size ~constant, so
within-cluster pair volume is O(n·target), linear in n)?

Corpus construction: k× replicas of sf0.1/embeddings.parquet
(2,000 → 8,000 → 32,000 vectors). Replica i > 0 applies a
replica-unique seeded SIGNED DIMENSION PERMUTATION (permute dims, then
flip each dim's sign with probability 1/2) to every vector — an
orthogonal transform, so each replica's internal pairwise-cosine
structure (and thus its duplicate components) is IDENTICAL to the base
corpus, while cross-replica cosines drop to generic near-zero levels
(a bare permutation is NOT enough: the testdata embeddings carry a
mean offset, so permuted copies stay cosine-similar and replicas
merge; the sign flips zero the expected cross inner product).
Duplicate volume per unit of corpus is ~constant — the harness
measures engine scaling, not pair-output growth. (Component counts
still drift with k_cents: a dup pair split across cluster boundaries
is missed — the SemDeDup recall trade documented in the paper.)

Quantizer: k_cents = max(16, n // 100) — UNCAPPED, the operator-level
path (the oracle-gated query caps at K_MAX=64 only to bound the
inlined DuckDB literal). Past 64 centroids semantic_dedup_keep routes
assignment through ivf_assign_arrow (one dgemm per Arrow batch); the
fixed-k=16 column is measured beside it to show what the r9 shape
(fixed k → clusters grow with the corpus → O(n²/k) pairs) would cost.

Usage: python tools/semdedup_scaling.py [k ...]   (default: 1 4 16)
       python tools/semdedup_scaling.py mmr [k ...]
           — the serving-tier mode (r11 verdict tasks 3/8): times
           mmr_rerank_micro (full-scan relevance + bounded greedy;
           expected ~linear scan, corpus-independent greedy) and
           train_semdedup_centroids (fixed 2048-row sample at any
           corpus — the scan is a TakeOrdered top-N, so cost is one
           linear pass with a bounded heap) across the same replica
           corpora.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    similarity,
)

BASE = "/root/testdata/sf0.1/embeddings.parquet"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchmarks",
    "semdedup",
)


def build(k: int) -> tuple[str, int]:
    path = os.path.join(OUT, f"k{k}")
    base = pd.read_parquet(BASE)
    n0 = len(base)
    v0 = np.asarray(base["embedding"].tolist(), dtype=np.float64)
    parts = []
    for r in range(k):
        if r == 0:
            v = v0
        else:
            rs = np.random.RandomState(1000 + r)
            perm = rs.permutation(v0.shape[1])
            signs = rs.choice([-1.0, 1.0], size=v0.shape[1])
            v = v0[:, perm] * signs[None, :]
        parts.append(
            pd.DataFrame(
                {
                    "vec_id": base["vec_id"].to_numpy() + r * n0,
                    "embedding": list(v.astype(np.float32)),
                }
            )
        )
    allp = pd.concat(parts, ignore_index=True)
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(allp, preserve_index=False),
        os.path.join(path, "embeddings.parquet"),
    )
    return path, len(allp)


def mmr_main(ks: list[int]) -> None:
    shutil.rmtree(OUT, ignore_errors=True)
    spark = get_spark(app_name="mmr-scaling", shuffle_partitions=32)
    rows = []
    warmed = False
    for k in ks:
        path, n = build(k)
        emb = spark.read.parquet(os.path.join(path, "embeddings.parquet"))
        emb.count()
        qvec = [
            float(x)
            for x in emb.filter("vec_id = 0").select("embedding").head()[0]
        ]
        if not warmed:
            similarity.mmr_rerank_micro(emb, qvec, k=10, shortlist=50)
            similarity.train_semdedup_centroids(emb, 64, sample=2048, iters=4)
            warmed = True
        # mmr_rerank_micro is an EAGER SNAPSHOT — construction runs the
        # corpus scan + greedy, so construction time IS the query time
        t0 = time.time()
        similarity.mmr_rerank_micro(emb, qvec, k=10, shortlist=50)
        t_mmr = round(time.time() - t0, 2)
        t0 = time.time()
        similarity.train_semdedup_centroids(emb, 64, sample=2048, iters=4)
        t_train = round(time.time() - t0, 2)
        rows.append({"k": k, "n": n, "mmr": t_mmr, "train": t_train})
        print(rows[-1], flush=True)
    base = rows[0]
    print()
    print("| corpus | mmr_rerank time | growth vs corpus |"
          " trainer time | growth vs corpus |")
    print("|---|---|---|---|---|")
    for r in rows:
        rm = (r["mmr"] / base["mmr"]) / (r["n"] / base["n"])
        rt = (r["train"] / base["train"]) / (r["n"] / base["n"])
        print(
            f"| {r['n']} | {r['mmr']}s | {rm:.2f}× linear |"
            f" {r['train']}s | {rt:.2f}× linear |"
        )


def main() -> None:
    if sys.argv[1:] and sys.argv[1] == "mmr":
        mmr_main([int(a) for a in sys.argv[2:]] or [1, 4, 16])
        return
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    shutil.rmtree(OUT, ignore_errors=True)
    spark = get_spark(app_name="semdedup-scaling", shuffle_partitions=32)
    rows = []
    warmed = False
    for k in ks:
        path, n = build(k)
        emb = spark.read.parquet(os.path.join(path, "embeddings.parquet"))
        emb.count()
        if not warmed:
            # one untimed pass: JVM codegen + Arrow python workers —
            # a cold k=1 baseline would flatter every later ratio
            similarity.semantic_dedup_keep(
                emb, similarity.make_unit_planes(dim=64, n_planes=16, seed=777)
            ).count()
            warmed = True
        res = {"k": k, "n": n}
        for label, kc in (
            ("k_grows", max(16, n // 100)),
            ("k_fixed16", 16),
        ):
            cents = similarity.make_unit_planes(dim=64, n_planes=kc, seed=777)
            t0 = time.time()
            out = similarity.semantic_dedup_keep(emb, cents, threshold=0.4)
            cnt = out.count()
            res[label] = round(time.time() - t0, 2)
            res[label + "_rows"] = cnt
            res[label + "_k"] = kc
        # two-level IMI at the same cell-count target: 2·K half-dots
        # per vector instead of K² full dots — the sub-quadratic
        # assignment leg (K² cells, K = ceil(sqrt(n/100)))
        import math

        K = max(4, math.ceil(math.sqrt(n / 100.0)))
        cb = similarity.make_imi_codebooks(64, K, seed=777)
        t0 = time.time()
        cnt = similarity.semantic_dedup_keep_imi(
            emb, cb, threshold=0.4
        ).count()
        res["imi"] = round(time.time() - t0, 2)
        res["imi_rows"] = cnt
        res["imi_cells"] = K * K
        rows.append(res)
        print(res, flush=True)

    base = rows[0]
    print()
    print("| corpus | k_cents | components | time | growth vs corpus |"
          " fixed k=16 time | IMI cells | IMI time |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        ratio = (r["k_grows"] / base["k_grows"]) / (r["n"] / base["n"])
        print(
            f"| {r['n']} | {r['k_grows_k']} | {r['k_grows_rows']} |"
            f" {r['k_grows']}s | {ratio:.2f}× linear |"
            f" {r['k_fixed16']}s | {r['imi_cells']} | {r['imi']}s |"
        )


if __name__ == "__main__":
    main()
