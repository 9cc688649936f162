"""Measure recall@k of the approximate-nearest-neighbor paths against
the exact brute-force oracle — the number that proves the indexes return
the RIGHT neighbors, not just plausible ones.

Two corpora, both deterministic:
  sf        — the driver's embeddings table (default sf0.01, 500×64,
              near-random vectors). Queries are seeded noisy copies of
              corpus vectors (the retrieval use case: a query embedding
              close to its relevant documents). Because the non-self
              neighbors of a random vector are themselves random, this
              measures the HARD regime — recall here is dataset-bound,
              and the probe budget (scan fraction) is the honest lever.
  clustered — planted cluster structure (what trained embeddings look
              like: Johnson, Douze & Jégou, "Billion-scale similarity
              search with GPUs", 2017 benchmark methodology): members
              share a cluster center, queries perturb a member. Here a
              good index MUST reach high recall at a small scan
              fraction, so this corpus carries the strong assertions.

Ground truth: multi_query_topk (exact, one corpus pass for all queries).
Approximate paths: lsh_multi_query_topk / ivf_multi_query_topk against
the PERSISTED partition-pruned indexes — the production serving shape.
Scan fraction = mean over queries of (rows in probed partitions)/N,
computed from the index's partition histogram.

Usage: python tools/ann_recall.py [sf_dir]     (default sf0.01)
Prints a markdown grid + one JSON line; paste the grid into PLANS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    similarity,
)

DIM = 64
K = 10
N_QUERIES = 100
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".benchmarks",
    "ann",
)


def noisy_queries(
    vecs: np.ndarray, n_queries: int, rel_noise: float, seed: int
) -> list[tuple[int, list[float]]]:
    """Seeded noisy copies of corpus vectors, evenly strided."""
    rng = np.random.RandomState(seed)
    n = len(vecs)
    out = []
    for qid in range(n_queries):
        v = vecs[(qid * max(1, n // n_queries)) % n]
        scale = rel_noise * float(np.linalg.norm(v)) / np.sqrt(vecs.shape[1])
        out.append((qid, list(v + scale * rng.randn(vecs.shape[1]))))
    return out


def clustered_corpus(
    n_clusters: int = 50, per_cluster: int = 40, eps: float = 0.15, seed: int = 11
) -> np.ndarray:
    """Planted structure: unit-norm centers, members = center + eps noise
    (expected within-cluster cosine ≈ 1/(1+eps²) ≈ 0.978 at eps=0.15)."""
    rng = np.random.RandomState(seed)
    rows = []
    for _ in range(n_clusters):
        c = rng.randn(DIM)
        c /= np.linalg.norm(c)
        for _ in range(per_cluster):
            rows.append(c + eps * rng.randn(DIM) / np.sqrt(DIM))
    return np.asarray(rows)


def exact_sets(spark, corpus_df, queries) -> dict[int, set]:
    gt = similarity.multi_query_topk(corpus_df, queries, K).collect()
    out: dict[int, set] = {}
    for r in gt:
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def recall_of(result_rows, exact: dict[int, set]) -> float:
    got: dict[int, set] = {}
    for r in result_rows:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    return float(
        np.mean([len(exact[q] & got.get(q, set())) / K for q in exact])
    )


def scan_fraction(hist: dict[int, int], probes: dict[int, list[int]]) -> float:
    n = sum(hist.values())
    return float(
        np.mean([sum(hist.get(b, 0) for b in bs) / n for bs in probes.values()])
    )


def measure(spark, name: str, vecs: np.ndarray, queries, planes, report):
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    n = corpus.count()
    exact = exact_sets(spark, corpus, queries)

    lsh_path = f"{OUT}/{name}_lsh"
    ivf_path = f"{OUT}/{name}_ivf"
    shutil.rmtree(lsh_path, ignore_errors=True)
    shutil.rmtree(ivf_path, ignore_errors=True)
    similarity.build_lsh_index(corpus, planes, lsh_path)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=16, sample=2048)
    similarity.build_ivf_index(corpus, cents, ivf_path)

    lsh_hist = {
        r.bucket: r["count"]
        for r in spark.read.parquet(lsh_path).groupBy("bucket").count().collect()
    }
    ivf_hist = {
        r.cid: r["count"]
        for r in spark.read.parquet(ivf_path).groupBy("cid").count().collect()
    }

    for mp in (0, 2, 4, 8, 16):
        rows = similarity.lsh_multi_query_topk(
            spark, lsh_path, queries, planes, K, multiprobe=mp
        ).collect()
        probes = {
            qid: similarity.query_buckets(qv, planes, mp) for qid, qv in queries
        }
        rec, frac = recall_of(rows, exact), scan_fraction(lsh_hist, probes)
        report.append((name, "lsh", f"multiprobe={mp}", rec, frac))
        print(f"{name:9s} lsh multiprobe={mp:<3d} recall@{K}={rec:.3f} scan={frac:.3f}")
    for npr in (1, 2, 4, 8):
        rows = similarity.ivf_multi_query_topk(
            spark, ivf_path, queries, cents, K, nprobe=npr
        ).collect()
        probes = {}
        for qid, qv in queries:
            d = ((cents - np.asarray(qv)) ** 2).sum(axis=1)
            probes[qid] = [int(i) for i in d.argsort()[:npr]]
        rec, frac = recall_of(rows, exact), scan_fraction(ivf_hist, probes)
        report.append((name, "ivf", f"nprobe={npr}", rec, frac))
        print(f"{name:9s} ivf nprobe={npr:<4d} recall@{K}={rec:.3f} scan={frac:.3f}")

    # IMI two-level cells (seeded per-half codebooks, 4 per half → 16
    # cells — the same cell count as the flat IVF above so the recall
    # curves compare the QUANTIZER GEOMETRY, not the cell budget),
    # served through the bulk operator (per-half in-plan ranking).
    imi_path = f"{OUT}/{name}_imi"
    shutil.rmtree(imi_path, ignore_errors=True)
    icb = similarity.make_imi_codebooks(DIM, 4, seed=99)
    similarity.build_imi_index(corpus, icb, imi_path)
    imi_hist = {
        r.cid: r["count"]
        for r in spark.read.parquet(imi_path).groupBy("cid").count().collect()
    }
    icn = (icb**2).sum(axis=2)
    dh = DIM // 2
    qdf = spark.createDataFrame(
        [(int(qid), [float(x) for x in qv]) for qid, qv in queries],
        "query_id long, qvec array<double>",
    )
    for npr in (1, 2, 4, 8):
        rows = similarity.imi_bulk_topk(
            spark, imi_path, qdf, icb, K, nprobe=npr
        ).collect()
        probes = {}
        for qid, qv in queries:
            q = np.asarray(qv, dtype=np.float64)
            d1 = icn[0] - 2.0 * (icb[0] @ q[:dh])
            d2 = icn[1] - 2.0 * (icb[1] @ q[dh:])
            combos = sorted(
                ((d1[i] + d2[j], i * 4 + j) for i in range(4) for j in range(4))
            )[:npr]
            probes[qid] = [cid for _, cid in combos]
        rec, frac = recall_of(rows, exact), scan_fraction(imi_hist, probes)
        report.append((name, "imi", f"nprobe={npr}", rec, frac))
        print(f"{name:9s} imi nprobe={npr:<4d} recall@{K}={rec:.3f} scan={frac:.3f}")

    # IMI with TRAINED per-half codebooks (the production quantizer —
    # independent Lloyd per half on a bounded sample), same cell budget
    imit_path = f"{OUT}/{name}_imit"
    shutil.rmtree(imit_path, ignore_errors=True)
    tcb = similarity.train_imi_codebooks(
        corpus, n_cells_per_half=4, sample=2048, seed=42
    )
    similarity.build_imi_index(corpus, tcb, imit_path)
    imit_hist = {
        r.cid: r["count"]
        for r in spark.read.parquet(imit_path).groupBy("cid").count().collect()
    }
    tcn = (tcb**2).sum(axis=2)
    for npr in (1, 2, 4, 8):
        rows = similarity.imi_bulk_topk(
            spark, imit_path, qdf, tcb, K, nprobe=npr
        ).collect()
        probes = {}
        for qid, qv in queries:
            q = np.asarray(qv, dtype=np.float64)
            d1 = tcn[0] - 2.0 * (tcb[0] @ q[:dh])
            d2 = tcn[1] - 2.0 * (tcb[1] @ q[dh:])
            combos = sorted(
                ((d1[i] + d2[j], i * len(tcb[0]) + j)
                 for i in range(len(tcb[0])) for j in range(len(tcb[1])))
            )[:npr]
            probes[qid] = [cid for _, cid in combos]
        rec, frac = recall_of(rows, exact), scan_fraction(imit_hist, probes)
        report.append((name, "imi-trained", f"nprobe={npr}", rec, frac))
        print(
            f"{name:9s} imi-trained nprobe={npr:<4d} recall@{K}={rec:.3f} "
            f"scan={frac:.3f}"
        )

    # PQ two-stage (trained codebooks, ADC shortlist + exact re-rank).
    # "scan" for PQ is the exact-math fraction: shortlist/n — the ADC
    # pass reads ALL the codes by design, but at 1/32 the bytes.
    pq_path = f"{OUT}/{name}_pq"
    shutil.rmtree(pq_path, ignore_errors=True)
    cb = similarity.train_pq_codebooks(corpus, m=8, k=16, seed=42)
    similarity.build_pq_index(corpus, cb, pq_path)
    for shortlist in (50, 100):
        rows = similarity.pq_multi_query_topk(
            spark, pq_path, corpus, queries, cb, K, shortlist=shortlist
        ).collect()
        rec = recall_of(rows, exact)
        frac = shortlist / n
        report.append((name, "pq", f"shortlist={shortlist}", rec, frac))
        print(
            f"{name:9s} pq shortlist={shortlist:<4d} recall@{K}={rec:.3f} "
            f"rerank_frac={frac:.3f}"
        )
    corpus.unpersist()
    return n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(shuffle_partitions=8)
    planes = similarity.make_planes(DIM, n_planes=8, seed=42)
    report: list[tuple] = []

    sf_vecs = np.asarray(
        [
            list(r.embedding)
            for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    measure(spark, "sf", sf_vecs, noisy_queries(sf_vecs, N_QUERIES, 0.35, 7), planes, report)

    cl_vecs = clustered_corpus()
    # report the planted within-cluster cosine so the regime is explicit
    a, b = cl_vecs[0], cl_vecs[1]
    wc = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    print(f"clustered within-cluster cosine (sample): {wc:.3f}")
    measure(spark, "clustered", cl_vecs, noisy_queries(cl_vecs, N_QUERIES, 0.10, 13), planes, report)

    print("\n| corpus | index | setting | recall@10 | scan fraction |")
    print("|---|---|---|---|---|")
    for name, idx, setting, rec, frac in report:
        print(f"| {name} | {idx} | {setting} | {rec:.3f} | {frac:.3f} |")
    print(
        json.dumps(
            {
                "k": K,
                "n_queries": N_QUERIES,
                "grid": [
                    {"corpus": c, "index": i, "setting": s, "recall": round(r, 4), "scan": round(f, 4)}
                    for c, i, s, r, f in report
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
