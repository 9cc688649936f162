"""Flat-vs-IMI bulk ANN serving as the CELL COUNT grows (r13 verdict
task 3's done condition): `ivf_bulk_topk` documents its own cap — the
flat broadcast-scalar centroid row costs O(cells·d) per query row, the
right carrier up to ~4k cells — and names the two-level quantizer as
the scale path. This witness measures both carriers at the same
nominal cell count (flat k_cells centroids vs IMI √k_cells per half)
on the same corpus and query set, isolating the per-query RANKING
cost: candidate volume is tiny at every point (2,000 corpus vectors
spread over ≥256 cells), so wall time tracks the in-plan fold work.

Codebooks/centroids are seeded unit directions (make_unit_planes /
make_imi_codebooks — ranking cost is oblivious to training); indexes
build once per cell count via the Arrow dgemm assigners so build cost
is symmetric and excluded from the timed serving runs. The witness
indexes are UNPARTITIONED (coalesced plain parquet): the bulk
operators JOIN on cid rather than partition-prune, and a
cid-partitioned layout at 4096 cells over a 2,000-vector fixture
fragments into thousands of tiny files whose listing/open cost
swamps the ranking signal being measured (the gated entries keep the
partitioned layout — their per-query siblings do prune). Timing is
median-of-3 after a warmup (the bench.py statistic), Q=320 queries.

Expected shape: flat ms/query grows ~linearly in cells (the fold is
cells·d multiplies per query row); IMI grows ~√cells (2·√cells·(d/2)
per-half scores + nprobe² combos) — the crossover the gated
`imi_bulk_topk` entry exists for.

Rewrites the "## IMI vs flat bulk ANN: cell-count scaling" section of
SCALING.md in place, preserving everything else.

Usage: python tools/imi_bulk_scaling.py [cells ...]  (default: 256 1024 4096)
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
SF_DIR = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, ".benchmarks", "imi_bulk")
MARK = "## IMI vs flat bulk ANN: cell-count scaling"
Q = 320
K = 10
NPROBE = 4
DIM = 64


def queries_df(spark, base_vecs: np.ndarray, q: int):
    rng = np.random.RandomState(1234)
    picks = rng.randint(0, len(base_vecs), size=q)
    noise = rng.randn(q, base_vecs.shape[1]) * 0.05
    qm = base_vecs[picks] + noise
    rows = [(int(i), [float(x) for x in qm[i]]) for i in range(q)]
    return spark.createDataFrame(rows, "query_id long, qvec array<double>")


def median3(fn) -> float:
    fn()  # warmup
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return sorted(samples)[1]


def main() -> None:
    cell_counts = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096]
    spark = get_spark(app_name="imi_bulk_scaling")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = np.asarray(
        [list(r.embedding) for r in emb.orderBy("vec_id").collect()],
        dtype=np.float64,
    )
    qdf = queries_df(spark, base, Q).localCheckpoint(eager=True)
    rows = []
    for cells in cell_counts:
        half = int(round(cells ** 0.5))
        assert half * half == cells, "cell counts must be perfect squares"
        flat_cents = similarity.make_unit_planes(DIM, cells, seed=99)
        imi_cb = similarity.make_imi_codebooks(DIM, half, seed=99)
        flat_path = f"{OUT}/flat_flat_{cells}"
        imi_path = f"{OUT}/imi_flat_{cells}"
        if not os.path.exists(f"{flat_path}/_SUCCESS"):
            similarity.ivf_assign_arrow(emb, flat_cents).coalesce(
                8
            ).write.mode("overwrite").parquet(flat_path)
        if not os.path.exists(f"{imi_path}/_SUCCESS"):
            similarity.imi_assign_arrow(emb, imi_cb).coalesce(
                8
            ).write.mode("overwrite").parquet(imi_path)
        flat_sec = median3(
            lambda: similarity.ivf_bulk_topk(
                spark, flat_path, qdf, flat_cents, k=K, nprobe=NPROBE
            ).count()
        )
        imi_sec = median3(
            lambda: similarity.imi_bulk_topk(
                spark, imi_path, qdf, imi_cb, k=K, nprobe=NPROBE
            ).count()
        )
        rows.append((cells, flat_sec, imi_sec))
        print(
            f"cells={cells}: flat {flat_sec:.2f}s "
            f"({flat_sec * 1000 / Q:.2f} ms/q), imi {imi_sec:.2f}s "
            f"({imi_sec * 1000 / Q:.2f} ms/q), "
            f"flat/imi {flat_sec / imi_sec:.2f}x"
        )

    lines = [
        MARK,
        "",
        f"`tools/imi_bulk_scaling.py` — the flat broadcast-scalar "
        f"carrier (`ivf_bulk_topk`) vs the two-level carrier "
        f"(`imi_bulk_topk`) at the same nominal cell count, "
        f"Q={Q} bulk queries over the sf0.1 embeddings, k={K}, "
        f"nprobe={NPROBE}, seeded unit-direction codebooks, indexes "
        "prebuilt (Arrow assigners), median-of-3 after warmup. "
        "Candidates are sparse at every point, so wall time isolates "
        "the per-query in-plan ranking cost — O(cells·d) for the flat "
        "fold vs O(√cells·d + nprobe²) for the per-half ranking:",
        "",
        "| cells | flat (sec / ms/query) | IMI (sec / ms/query) | "
        "flat ÷ IMI |",
        "|---|---|---|---|",
    ]
    for cells, fs, is_ in rows:
        lines.append(
            f"| {cells} | {fs:.2f}s / {fs * 1000 / Q:.2f} | "
            f"{is_:.2f}s / {is_ * 1000 / Q:.2f} | {fs / is_:.2f}× |"
        )
    lines += [
        "",
        "The flat carrier is the right choice while cells ≲ a few "
        "hundred (simpler plan, same single exchange); past ~1k cells "
        "the per-query fold dominates and the two-level carrier holds "
        "ms/query roughly flat — the regime the gated `imi_bulk_topk` "
        "entry serves. At 100 TB the cell count tracks the corpus "
        "(k ∝ n/target-cell-size), so the IMI leg is the one that "
        "survives the scale-up; pruning losslessness is pinned in "
        "tests/test_similarity.py and the DuckDB twin.",
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
