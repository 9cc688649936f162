"""Trained-codebook IMI at the scale crossover (the r14 verdict's task
5): `tools/imi_bulk_scaling.py` shows the two-level carrier holding
~3 ms/query to 16k cells with SEEDED codebooks, and `tools/ann_recall.py`
shows `train_imi_codebooks` recovering recall 0.731→0.981 at a SMALL
matched budget (16 cells). Neither measures both numbers at once in the
regime the IMI leg exists for (≥4k cells — past the flat carrier's
documented ~4k-cell cap). This witness joins them: ONE row pinning
ms/query AND recall@k for `imi_bulk_topk` under `train_imi_codebooks`
output at 4096 cells on the clustered corpus (ann_recall's
planted-cluster methodology — the structure trained embeddings have),
seeded codebooks beside it as the control.

Methodology: 4,000-vector clustered corpus (100 planted unit-norm
centers × 40 members, eps=0.15 — within-cluster cosine ≈ 0.978),
Q=320 noisy-member queries, k=10, nprobe=4. Ground truth is the exact
`multi_query_topk` (one corpus pass for all queries). Indexes are
UNPARTITIONED coalesced parquet (imi_bulk_scaling's layout argument: a
cid-partitioned layout at 4096 cells over a 4k-vector fixture fragments
into thousands of tiny files whose open cost swamps the ranking signal;
the gated entries keep the partitioned pruning layout). Timing is
median-of-3 after a warmup.

Rewrites the "## Trained vs seeded IMI at the 4096-cell crossover"
section of SCALING.md in place, preserving everything else.

Usage: python tools/imi_trained_crossover.py [cells]   (default 4096)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    similarity,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".benchmarks", "imi_trained")
MARK = "## Trained vs seeded IMI at the 4096-cell crossover"
DIM = 64
K = 10
NPROBE = 4
Q = 320
N_CLUSTERS = 100
PER_CLUSTER = 40
EPS = 0.15


def clustered_corpus() -> np.ndarray:
    """ann_recall.py's planted-structure generator at 2× its size."""
    rng = np.random.RandomState(11)
    rows = []
    for _ in range(N_CLUSTERS):
        c = rng.randn(DIM)
        c /= np.linalg.norm(c)
        for _ in range(PER_CLUSTER):
            rows.append(c + EPS * rng.randn(DIM) / np.sqrt(DIM))
    return np.asarray(rows)


def median3(fn) -> float:
    fn()  # warmup
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[1]


def main() -> None:
    cells = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    half = int(round(cells**0.5))
    assert half * half == cells, "cell count must be a perfect square"
    spark = get_spark(app_name="imi_trained_crossover")
    vecs = clustered_corpus()
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)

    rng = np.random.RandomState(1234)
    picks = rng.randint(0, len(vecs), size=Q)
    qm = vecs[picks] + rng.randn(Q, DIM) * 0.05
    qdf = spark.createDataFrame(
        [(int(i), [float(x) for x in qm[i]]) for i in range(Q)],
        "query_id long, qvec array<double>",
    ).localCheckpoint(eager=True)
    queries = [(int(i), [float(x) for x in qm[i]]) for i in range(Q)]

    exact: dict[int, set] = {}
    for r in similarity.multi_query_topk(corpus, queries, K).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    os.makedirs(OUT, exist_ok=True)
    results = {}
    for tag, cb in (
        ("seeded", similarity.make_imi_codebooks(DIM, half, seed=99)),
        (
            "trained",
            similarity.train_imi_codebooks(
                corpus, n_cells_per_half=half, sample=2048, iters=10,
                seed=42,
            ),
        ),
    ):
        path = f"{OUT}/{tag}_{cells}"
        similarity.imi_assign_arrow(corpus, cb).coalesce(8).write.mode(
            "overwrite"
        ).parquet(path)
        got: dict[int, set] = {}
        for r in similarity.imi_bulk_topk(
            spark, path, qdf, cb, k=K, nprobe=NPROBE
        ).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        recall = float(
            np.mean([len(exact[q] & got.get(q, set())) / K for q in exact])
        )
        sec = median3(
            lambda p=path, c=cb: similarity.imi_bulk_topk(
                spark, p, qdf, c, k=K, nprobe=NPROBE
            ).count()
        )
        results[tag] = (sec, recall)
        print(
            f"{tag}: {sec:.2f}s ({sec * 1000 / Q:.2f} ms/q), "
            f"recall@{K}={recall:.3f}"
        )

    s_sec, s_rec = results["seeded"]
    t_sec, t_rec = results["trained"]
    rec_line = (
        "Trained halves adapt to the planted clusters exactly as the "
        "16-cell ann_recall measurement predicted — the production "
        "recommendation stands: SERVE `imi_bulk_topk` with "
        "`train_imi_codebooks` output once cells ≥ 4k."
        if t_rec > s_rec + 0.05
        else "Trained and seeded recall are within noise at this cell "
        "count/probe budget; the trained leg still costs nothing extra "
        "to serve."
    )
    lines = [
        MARK,
        "",
        "`tools/imi_trained_crossover.py` — ms/query AND recall@10 for "
        "`imi_bulk_topk` in the regime the two-level carrier exists for "
        f"({cells} cells — past the flat carrier's ~4k-cell cap), on "
        f"the clustered corpus ({N_CLUSTERS} planted centers × "
        f"{PER_CLUSTER}, eps={EPS} — ann_recall.py's methodology), "
        f"Q={Q}, k={K}, nprobe={NPROBE}, exact multi_query_topk ground "
        "truth, median-of-3 after warmup:",
        "",
        "| codebooks | sec / ms/query | recall@10 |",
        "|---|---|---|",
        f"| seeded (`make_imi_codebooks`) | {s_sec:.2f}s / "
        f"{s_sec * 1000 / Q:.2f} | {s_rec:.3f} |",
        f"| trained (`train_imi_codebooks`, per-half Lloyd) | "
        f"{t_sec:.2f}s / {t_sec * 1000 / Q:.2f} | {t_rec:.3f} |",
        "",
        rec_line,
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
