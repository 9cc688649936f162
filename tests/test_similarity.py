"""Similarity-search tests: brute-force cosine vs a numpy oracle, LSH
probe correctness, and partition pruning on the persisted index."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (
    similarity,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.plans.explain import (
    formatted_plan,
)

DIM = 8
N = 60


def _corpus(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(N, DIM)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    return (
        spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"),
        vecs,
    )


def test_brute_force_topk_matches_numpy(spark):
    corpus, vecs = _corpus(spark)
    q = vecs[0]
    got = [r.vec_id for r in similarity.brute_force_topk(corpus, list(q), k=5).collect()]
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    # replicate the query's floor-quantize + id tiebreak
    quant = np.floor(sims * 1e6 + 0.5) / 1e6
    want = sorted(range(N), key=lambda i: (-quant[i], i))[:5]
    assert got == want


def test_brute_force_topk_self_is_top1(spark):
    corpus, vecs = _corpus(spark)
    top = similarity.brute_force_topk(corpus, list(vecs[3]), k=1).first()
    assert top.vec_id == 3 and top.cos_sim == pytest.approx(1.0, abs=1e-6)


def test_lsh_topk_subset_of_probed_buckets(spark):
    corpus, vecs = _corpus(spark)
    planes = similarity.make_planes(DIM, n_planes=4, seed=1)
    probes = set(similarity.query_buckets(list(vecs[0]), planes, multiprobe=2))
    got = similarity.lsh_bucketed_topk(
        corpus, list(vecs[0]), planes, k=10, multiprobe=2
    ).collect()
    indexed = {
        r.vec_id: r.bucket for r in similarity.lsh_index(corpus, planes).collect()
    }
    assert got, "query's own bucket can never be empty"
    for r in got:
        assert indexed[r.vec_id] in probes


def test_persisted_index_partition_pruning(spark, tmp_dir):
    corpus, vecs = _corpus(spark)
    planes = similarity.make_planes(DIM, n_planes=4, seed=1)
    path = f"{tmp_dir}/lsh_index"
    similarity.build_lsh_index(corpus, planes, path)
    out = similarity.lsh_topk_from_index(
        spark, path, list(vecs[0]), planes, k=5, multiprobe=1
    )
    plan = formatted_plan(out)
    # the probe predicate must reach the scan as a partition filter
    assert "PartitionFilters" in plan and "bucket" in plan
    top = out.first()
    assert top.vec_id == 0  # the query vector itself survives the probe


def test_ivf_assign_matches_numpy_argmin(spark):
    corpus, vecs = _corpus(spark)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=4, sample=60, seed=3)
    got = {
        r.vec_id: r.cid for r in similarity.ivf_assign(corpus, cents).collect()
    }
    d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    assert all(got[i] == want[i] for i in range(N))


def test_ivf_index_probe_finds_query_vector(spark, tmp_dir):
    corpus, vecs = _corpus(spark)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=4, sample=60, seed=3)
    path = f"{tmp_dir}/ivf"
    similarity.build_ivf_index(corpus, cents, path)
    out = similarity.ivf_topk_from_index(spark, path, list(vecs[7]), cents, k=3, nprobe=1)
    plan = formatted_plan(out)
    assert "PartitionFilters" in plan and "cid" in plan  # pruned probe
    assert out.first().vec_id == 7  # nearest centroid holds the vector itself


def test_index_and_flyscan_agree(spark, tmp_dir):
    corpus, vecs = _corpus(spark)
    planes = similarity.make_planes(DIM, n_planes=4, seed=1)
    path = f"{tmp_dir}/lsh_index2"
    similarity.build_lsh_index(corpus, planes, path)
    a = similarity.lsh_topk_from_index(
        spark, path, list(vecs[5]), planes, k=5, multiprobe=2
    ).collect()
    b = similarity.lsh_bucketed_topk(
        corpus, list(vecs[5]), planes, k=5, multiprobe=2
    ).collect()
    assert [(r.vec_id, r.cos_sim) for r in a] == [(r.vec_id, r.cos_sim) for r in b]


def test_ann_recall_vs_brute_force(spark):
    """Recall@10 of the approximate paths against exact brute force on the
    sf0.001 embeddings (64-dim, deterministic planes/centroid seeds).
    Floors are empirical for these fixed seeds — a drop means an index
    regression, not dataset noise."""
    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = corpus.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    qvecs = {
        r.vec_id: r.embedding
        for r in corpus.filter(F.col("vec_id") < 3).collect()
    }
    planes = similarity.make_planes(64, n_planes=6, seed=42)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=8, sample=512)

    lsh_recalls, ivf_recalls = [], []
    for qid, qv in qvecs.items():
        exact = {
            r.vec_id for r in similarity.brute_force_topk(corpus, qv, 10).collect()
        }
        lsh = {
            r.vec_id
            for r in similarity.lsh_bucketed_topk(
                corpus, qv, planes, 10, multiprobe=15
            ).collect()
        }
        cand = similarity.ivf_assign(corpus, cents)
        import numpy as np

        d = ((cents - np.asarray(qv)) ** 2).sum(axis=1)
        probes = [int(i) for i in d.argsort()[:3]]
        ivf = {
            r.vec_id
            for r in similarity.brute_force_topk(
                cand.filter(F.col("cid").isin(probes)), qv, 10
            ).collect()
        }
        lsh_recalls.append(len(exact & lsh) / 10)
        ivf_recalls.append(len(exact & ivf) / 10)

    # floors: measured 0.50 (LSH, 16/64 buckets probed) and IVF at 3/8
    # centroids on these seeds; the synthetic embeddings are near-random
    # so absolute recall is dataset-bound — the assertion pins regressions
    assert sum(lsh_recalls) / len(lsh_recalls) >= 0.4, lsh_recalls
    assert sum(ivf_recalls) / len(ivf_recalls) >= 0.5, ivf_recalls


def _recall_setup(spark, tmp_dir, vecs, queries, planes):
    """Build both persisted indexes + exact ground truth for a corpus."""
    from tools.ann_recall import exact_sets

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    exact = exact_sets(spark, corpus, queries)
    lsh_path, ivf_path = f"{tmp_dir}/lsh", f"{tmp_dir}/ivf"
    similarity.build_lsh_index(corpus, planes, lsh_path)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=16, sample=2048)
    similarity.build_ivf_index(corpus, cents, ivf_path)
    corpus.unpersist()
    return exact, lsh_path, ivf_path, cents


def _mean_recall(rows, exact, k=10):
    got = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    return sum(len(exact[q] & got.get(q, set())) / k for q in exact) / len(exact)


def test_ann_recall_at_10_clustered_corpus(spark, tmp_dir):
    """Recall@10 over 100 query vectors on a planted-cluster corpus
    (within-cluster cosine ≈0.98 — the regime trained embeddings live
    in), measured through the PERSISTED indexes via the batch serving
    path. tools/ann_recall.py measured: LSH multiprobe=2 → 0.907 at
    2.7% scan; IVF nprobe=4 → 1.000 at 42% scan (nprobe=1 already
    1.000 at 9.2%). Floors leave noise margin; a drop is an index
    regression. Full grid (both corpora) in PLANS.md."""
    from tools.ann_recall import DIM as ADIM
    from tools.ann_recall import clustered_corpus, noisy_queries

    vecs = clustered_corpus()
    queries = noisy_queries(vecs, 100, 0.10, 13)
    planes = similarity.make_planes(ADIM, n_planes=8, seed=42)
    exact, lsh_path, ivf_path, cents = _recall_setup(
        spark, tmp_dir, vecs, queries, planes
    )
    lsh = similarity.lsh_multi_query_topk(
        spark, lsh_path, queries, planes, 10, multiprobe=2
    ).collect()
    ivf = similarity.ivf_multi_query_topk(
        spark, ivf_path, queries, cents, 10, nprobe=4
    ).collect()
    assert _mean_recall(lsh, exact) >= 0.85
    assert _mean_recall(ivf, exact) >= 0.95


def test_ann_recall_at_10_sf_embeddings(spark, tmp_dir):
    """Same measurement on the sf0.01 embeddings table — near-random
    vectors, the HARD regime where recall is bounded by the probe
    budget. Measured: LSH multiprobe=16 → 0.273 at 7.8% scan; IVF
    nprobe=8 → 0.829 at 51% scan. Floors pin regressions; the numbers
    themselves (and why they differ from the clustered corpus) are
    documented in PLANS.md."""
    from tools.ann_recall import DIM as ADIM
    from tools.ann_recall import noisy_queries

    vecs = np.asarray(
        [
            list(r.embedding)
            for r in spark.read.parquet(
                "/root/testdata/sf0.01/embeddings.parquet"
            )
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    queries = noisy_queries(vecs, 100, 0.35, 7)
    planes = similarity.make_planes(ADIM, n_planes=8, seed=42)
    exact, lsh_path, ivf_path, cents = _recall_setup(
        spark, tmp_dir, vecs, queries, planes
    )
    lsh = similarity.lsh_multi_query_topk(
        spark, lsh_path, queries, planes, 10, multiprobe=16
    ).collect()
    ivf = similarity.ivf_multi_query_topk(
        spark, ivf_path, queries, cents, 10, nprobe=8
    ).collect()
    assert _mean_recall(lsh, exact) >= 0.20
    assert _mean_recall(ivf, exact) >= 0.72

    # PQ two-stage (trained codebooks, shortlist=100) on the same hard
    # regime: measured 0.862 — the compact-code index holds up where the
    # oblivious LSH partitions can't, because the ADC pass ranks the
    # WHOLE corpus (just coarsely) instead of pruning it
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cbk = similarity.train_pq_codebooks(corpus, m=8, k=16, seed=42)
    pq_path = f"{tmp_dir}/pq_sf"
    similarity.build_pq_index(corpus, cbk, pq_path)
    pq = similarity.pq_multi_query_topk(
        spark, pq_path, corpus, queries, cbk, 10, shortlist=100
    ).collect()
    assert _mean_recall(pq, exact) >= 0.75


def test_batch_probe_paths_match_single_query_paths(spark, tmp_dir):
    """lsh_multi_query_topk / ivf_multi_query_topk are the batched twins
    of lsh_topk_from_index / ivf_topk_from_index: per query, identical
    (id, score) lists."""
    corpus, vecs = _corpus(spark)
    planes = similarity.make_planes(DIM, n_planes=4, seed=1)
    lsh_path, ivf_path = f"{tmp_dir}/lsh", f"{tmp_dir}/ivf"
    similarity.build_lsh_index(corpus, planes, lsh_path)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=4, sample=64)
    similarity.build_ivf_index(corpus, cents, ivf_path)
    queries = [(0, list(vecs[3])), (1, list(vecs[17])), (2, list(vecs[44]))]
    lsh_batch = similarity.lsh_multi_query_topk(
        spark, lsh_path, queries, planes, k=5, multiprobe=2
    ).collect()
    ivf_batch = similarity.ivf_multi_query_topk(
        spark, ivf_path, queries, cents, k=5, nprobe=2
    ).collect()
    for qid, qv in queries:
        singles = similarity.lsh_topk_from_index(
            spark, lsh_path, qv, planes, k=5, multiprobe=2
        ).collect()
        batch = sorted(
            [(r.vec_id, r.cos_sim) for r in lsh_batch if r.query_id == qid],
            key=lambda t: (-t[1], t[0]),
        )
        assert batch == [(r.vec_id, r.cos_sim) for r in singles]
        singles = similarity.ivf_topk_from_index(
            spark, ivf_path, qv, cents, k=5, nprobe=2
        ).collect()
        batch = sorted(
            [(r.vec_id, r.cos_sim) for r in ivf_batch if r.query_id == qid],
            key=lambda t: (-t[1], t[0]),
        )
        assert batch == [(r.vec_id, r.cos_sim) for r in singles]


def test_ivf_bulk_topk_matches_driver_side_per_query_path(spark, tmp_dir):
    """ivf_bulk_topk ranks probe cells IN-PLAN (zip_with/aggregate fold
    + array_sort tie-break) where ivf_multi_query_topk ranks them
    driver-side per query — same probe sets, same candidates, same
    quantized top-k on the same query set (the r12 verdict's done
    condition for the bulk leg)."""
    corpus, vecs = _corpus(spark)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=4, sample=64)
    ivf_path = f"{tmp_dir}/ivf_bulk"
    similarity.build_ivf_index(corpus, cents, ivf_path)
    queries = [
        (i, [float(x) for x in vecs[j]]) for i, j in enumerate((3, 17, 44, 59))
    ]
    per_query = similarity.ivf_multi_query_topk(
        spark, ivf_path, queries, cents, k=5, nprobe=2
    ).collect()
    qdf = spark.createDataFrame(queries, "query_id long, qvec array<double>")
    bulk = similarity.ivf_bulk_topk(
        spark, ivf_path, qdf, cents, k=5, nprobe=2
    ).collect()

    def key(rows):
        return sorted((r.query_id, r.vec_id, r.cos_sim) for r in rows)

    assert key(bulk) == key(per_query)
    # zero-norm queries have no cosine ordering: dropped in-plan, never
    # an error (matches the serving paths' source filter)
    qdf0 = spark.createDataFrame(
        [(99, [0.0] * DIM)], "query_id long, qvec array<double>"
    )
    assert (
        similarity.ivf_bulk_topk(spark, ivf_path, qdf0, cents, k=5, nprobe=2)
    ).count() == 0
    # salting splits hot-cell candidate work without changing the
    # candidate set: results are bit-identical at any salt
    salted = similarity.ivf_bulk_topk(
        spark, ivf_path, qdf, cents, k=5, nprobe=2, salt=4
    ).collect()
    assert key(salted) == key(bulk)
    assert "__salt" not in salted[0].asDict()


def test_lsh_bulk_topk_matches_driver_side_per_query_path(spark, tmp_dir):
    """lsh_bulk_topk computes buckets + multi-probe mask ranking
    IN-PLAN where lsh_multi_query_topk ranks probes driver-side
    (query_buckets): same probe sets, same candidates, same quantized
    top-k on the same query set — at multiprobe 0 AND 2."""
    corpus, vecs = _corpus(spark)
    planes = similarity.make_planes(DIM, n_planes=4, seed=1)
    lsh_path = f"{tmp_dir}/lsh_bulk"
    similarity.build_lsh_index(corpus, planes, lsh_path)
    queries = [
        (i, [float(x) for x in vecs[j]]) for i, j in enumerate((3, 17, 44, 59))
    ]
    qdf = spark.createDataFrame(queries, "query_id long, qvec array<double>")

    def key(rows):
        return sorted((r.query_id, r.vec_id, r.cos_sim) for r in rows)

    for mp in (0, 2):
        per_query = similarity.lsh_multi_query_topk(
            spark, lsh_path, queries, planes, k=5, multiprobe=mp
        ).collect()
        bulk = similarity.lsh_bulk_topk(
            spark, lsh_path, qdf, planes, k=5, multiprobe=mp
        ).collect()
        assert key(bulk) == key(per_query), f"multiprobe={mp}"
    # zero-norm queries drop in-plan, never an error
    qdf0 = spark.createDataFrame(
        [(99, [0.0] * DIM)], "query_id long, qvec array<double>"
    )
    assert (
        similarity.lsh_bulk_topk(spark, lsh_path, qdf0, planes, k=5,
                                 multiprobe=2)
    ).count() == 0
    # salting splits hot-bucket candidate work without changing the
    # candidate set: results bit-identical at any salt
    salted = similarity.lsh_bulk_topk(
        spark, lsh_path, qdf, planes, k=5, multiprobe=2, salt=4
    ).collect()
    assert key(salted) == key(bulk)


def test_imi_bulk_topk_matches_unpruned_numpy_reference(spark, tmp_dir):
    """imi_bulk_topk prunes each half to its top-nprobe cells before
    combining (nprobe² combos instead of K²); the multi-index property
    says that pruning is LOSSLESS — the i-th best combo's halves each
    rank ≤ i in their own lists, ties included under the (d, i) struct
    order. The numpy reference here ranks ALL K² combos per query (no
    pruning) with the same (score, cid) tie-break, probes the same
    top-nprobe cells, and recomputes the quantized-cosine top-k over
    the index's own assignments — bulk output must match exactly."""
    corpus, vecs = _corpus(spark)
    cb = similarity.make_imi_codebooks(DIM, n_cells_per_half=4, seed=5)
    K = cb.shape[1]
    dh = DIM // 2
    imi_path = f"{tmp_dir}/imi_bulk"
    similarity.build_imi_index(corpus, cb, imi_path)
    queries = [
        (i, [float(x) for x in vecs[j]]) for i, j in enumerate((3, 17, 44, 59))
    ]
    qdf = spark.createDataFrame(queries, "query_id long, qvec array<double>")
    nprobe = 3
    bulk = similarity.imi_bulk_topk(
        spark, imi_path, qdf, cb, k=5, nprobe=nprobe
    ).collect()
    idx = spark.read.parquet(imi_path).collect()
    by_cell: dict[int, list] = {}
    for r in idx:
        by_cell.setdefault(int(r.cid), []).append(
            (int(r.vec_id), np.asarray(r.embedding, dtype=np.float64))
        )
    cn = (cb**2).sum(axis=2)
    expected = []
    for qid, qv in queries:
        q = np.asarray(qv, dtype=np.float64)
        d1 = cn[0] - 2.0 * (cb[0] @ q[:dh])
        d2 = cn[1] - 2.0 * (cb[1] @ q[dh:])
        combos = sorted(
            ((d1[i] + d2[j], i * K + j) for i in range(K) for j in range(K))
        )[:nprobe]
        cands = []
        for _, cid in combos:
            for vid, v in by_cell.get(cid, []):
                cos = float(q @ v) / (
                    float(np.sqrt(v @ v)) * float(np.sqrt(q @ q))
                )
                cands.append((vid, np.floor(cos * 1e6 + 0.5) / 1e6))
        cands.sort(key=lambda t: (-t[1], t[0]))
        expected.extend((qid, vid, cos) for vid, cos in cands[:5])
    got = sorted((r.query_id, r.vec_id, r.cos_sim) for r in bulk)
    assert got == sorted(expected)
    # zero-norm queries drop in-plan, never an error
    qdf0 = spark.createDataFrame(
        [(99, [0.0] * DIM)], "query_id long, qvec array<double>"
    )
    assert (
        similarity.imi_bulk_topk(spark, imi_path, qdf0, cb, k=5, nprobe=2)
    ).count() == 0
    # salting splits hot-cell candidate work without changing the
    # candidate set: results bit-identical at any salt
    salted = similarity.imi_bulk_topk(
        spark, imi_path, qdf, cb, k=5, nprobe=nprobe, salt=4
    ).collect()
    assert sorted(
        (r.query_id, r.vec_id, r.cos_sim) for r in salted
    ) == got


def test_trained_imi_codebooks_beat_seeded_on_clustered_corpus(spark, tmp_dir):
    """train_imi_codebooks (independent per-half Lloyd on a bounded
    sample) must recover the recall the oblivious seeded product
    quantizer loses on clustered data — the regime trained embeddings
    live in. Floor-pinned at nprobe=1 on a planted-cluster corpus
    (ann_recall.py measured 0.981 trained vs 0.731 seeded at 16
    cells); determinism: same seed → identical codebooks."""
    rng = np.random.RandomState(11)
    rows = []
    for _ in range(20):
        c = rng.randn(DIM)
        c /= np.linalg.norm(c)
        for _ in range(20):
            rows.append(c + 0.15 * rng.randn(DIM) / np.sqrt(DIM))
    vecs = np.asarray(rows)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    queries = [
        (i, [float(x) for x in vecs[i * 37 % len(vecs)]]) for i in range(20)
    ]
    qdf = spark.createDataFrame(queries, "query_id long, qvec array<double>")
    exact = {
        qid: {
            r.vec_id
            for r in similarity.brute_force_topk(corpus, qv, 10).collect()
        }
        for qid, qv in queries
    }

    def recall(cb, path):
        similarity.build_imi_index(corpus, cb, path)
        got: dict[int, set] = {}
        for r in similarity.imi_bulk_topk(
            spark, path, qdf, cb, k=10, nprobe=1
        ).collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        return float(
            np.mean([len(exact[q] & got.get(q, set())) / 10 for q in exact])
        )

    seeded = similarity.make_imi_codebooks(DIM, 4, seed=99)
    trained = similarity.train_imi_codebooks(
        corpus, n_cells_per_half=4, sample=400, seed=42
    )
    assert trained.shape == (2, 4, DIM // 2)
    again = similarity.train_imi_codebooks(
        corpus, n_cells_per_half=4, sample=400, seed=42
    )
    assert np.array_equal(trained, again)
    r_seeded = recall(seeded, f"{tmp_dir}/imi_seed")
    r_trained = recall(trained, f"{tmp_dir}/imi_train")
    assert r_trained >= max(0.8, r_seeded)


def test_train_imi_codebooks_empty_corpus_raises_clearly(spark):
    """r14 advice: an empty corpus used to die with an opaque
    IndexError (x.shape[1] on a 0-row array) before the friendly
    dim-parity assert ran — now it raises a clear ValueError."""
    import pytest

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no vectors"):
        similarity.train_imi_codebooks(empty, n_cells_per_half=4)


def test_imi_assign_exact_matches_arrow_assignment(spark):
    """imi_assign_exact (the JVM fold/argmin build path the oracle
    replays) agrees with imi_assign_arrow (the dgemm batch path) on
    every corpus row — two implementations, one cell contract."""
    corpus, _ = _corpus(spark)
    cb = similarity.make_imi_codebooks(DIM, n_cells_per_half=4, seed=5)
    exact = {
        r.vec_id: int(r.cid)
        for r in similarity.imi_assign_exact(corpus, cb).collect()
    }
    arrow = {
        r.vec_id: int(r.cid)
        for r in similarity.imi_assign_arrow(corpus, cb).collect()
    }
    assert exact == arrow


def test_bulk_topk_small_page_gets_dynamic_partition_pruning(spark, tmp_dir):
    """The r13 verdict's lsh_bulk_topk nit: the bulk path 'always joins
    the full bucket-partitioned index'. It does not — for a SMALL query
    page Spark's dynamic partition pruning turns the in-plan probe
    computation into a runtime PartitionFilter on the partitioned index
    scan (SubqueryAdaptiveBroadcast feeding `dynamicpruning#N`), so a
    request-sized page reads only its probed partitions while bulk
    volume degrades gracefully to the full scan the docstring
    describes. Pinned here for both partitioned index families."""
    corpus, vecs = _corpus(spark)
    planes = similarity.make_planes(DIM, n_planes=4, seed=1)
    lsh_path = f"{tmp_dir}/lsh_dpp"
    similarity.build_lsh_index(corpus, planes, lsh_path)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=4, sample=64)
    ivf_path = f"{tmp_dir}/ivf_dpp"
    similarity.build_ivf_index(corpus, cents, ivf_path)
    page = spark.createDataFrame(
        [(0, [float(x) for x in vecs[3]])],
        "query_id long, qvec array<double>",
    )
    lsh_plan = (
        similarity.lsh_bulk_topk(spark, lsh_path, page, planes, k=5,
                                 multiprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in lsh_plan.lower()
    ivf_plan = (
        similarity.ivf_bulk_topk(spark, ivf_path, page, cents, k=5,
                                 nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "dynamicpruning" in ivf_plan.lower()


def test_bulk_topk_edge_cases(spark, tmp_dir):
    """nprobe beyond the cell count degrades to a full-index scan (not
    an error); multiprobe beyond the mask count probes every mask; an
    empty query frame returns an empty result with the right schema."""
    corpus, vecs = _corpus(spark)
    cents = similarity.train_ivf_centroids(corpus, n_centroids=4, sample=64)
    planes = similarity.make_planes(DIM, n_planes=4, seed=1)
    ivf_path, lsh_path = f"{tmp_dir}/ivf_edge", f"{tmp_dir}/lsh_edge"
    similarity.build_ivf_index(corpus, cents, ivf_path)
    similarity.build_lsh_index(corpus, planes, lsh_path)
    q = [(0, [float(x) for x in vecs[3]])]
    qdf = spark.createDataFrame(q, "query_id long, qvec array<double>")
    # nprobe = 99 > 4 cells: every cell probed → exact top-k
    got = similarity.ivf_bulk_topk(
        spark, ivf_path, qdf, cents, k=3, nprobe=99
    ).collect()
    want = similarity.brute_force_topk(corpus, q[0][1], k=3).collect()
    assert [(r.vec_id, r.cos_sim) for r in got] == [
        (r.vec_id, r.cos_sim) for r in want
    ]
    # multiprobe = 999 > 14 masks (n=4, flips ≤ 3): probes all of them
    got = similarity.lsh_bulk_topk(
        spark, lsh_path, qdf, planes, k=3, multiprobe=999
    ).collect()
    assert got and got[0].vec_id == 3
    # empty query frame → empty result, schema intact
    empty = spark.createDataFrame([], "query_id long, qvec array<double>")
    out = similarity.ivf_bulk_topk(spark, ivf_path, empty, cents, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "cos_sim"]


def test_multiprobe_masks_replicate_query_buckets_order(spark):
    """The (score, tie_rank) mask ranking must reproduce
    query_buckets' sorted((score, flips)) EXACTLY — including tuple
    tie-breaks — for any projection vector."""
    import numpy as np

    rng = np.random.RandomState(3)
    planes = similarity.make_planes(DIM, n_planes=5, seed=9)
    for _ in range(20):
        q = [float(x) for x in rng.randn(DIM)]
        want = similarity.query_buckets(q, planes, multiprobe=4)
        proj = [
            sum(float(a) * float(b) for a, b in zip(q, p)) for p in planes
        ]
        qb = 0
        for i, v in enumerate(proj):
            if v > 0:
                qb |= 1 << i
        scored = sorted(
            (sum(abs(proj[b]) for b in bits), tie, mask)
            for mask, tie, bits in similarity.multiprobe_masks(5)
        )
        got = [qb] + [qb ^ mask for _s, _t, mask in scored[:4]]
        assert got == want


def test_embedding_near_dup_pairs_finds_planted_dups(spark):
    """Plant 20 near-duplicate vector pairs (cos ~0.99) among decoys;
    the banded-LSH near-dup operator must recover almost all of them
    (p_bucket ~= 0.955^8 ~= 0.69/band -> recall ~0.99 with 4 bands) and
    every returned pair must genuinely clear the cosine threshold."""
    rng = np.random.RandomState(11)
    base = rng.randn(20, DIM * 4)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        dup = v + 0.02 * rng.randn(DIM * 4) * np.linalg.norm(v) / (DIM * 4) ** 0.5
        rows.append((100 + i, [float(x) for x in dup]))
    for j in range(40):  # decoys
        rows.append((1000 + j, [float(x) for x in rng.randn(DIM * 4)]))
    corpus = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>")

    got = similarity.embedding_near_dup_pairs(
        corpus, dim=DIM * 4, threshold=0.9, n_planes=8, bands=4
    ).collect()
    vec = {r[0]: np.asarray(r[1]) for r in rows}
    for r in got:  # precision: exact cosine really clears the threshold
        a, b = vec[r.id_a], vec[r.id_b]
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos >= 0.9 - 1e-6, (r.id_a, r.id_b, cos)
    planted = {(i, 100 + i) for i in range(20)}
    found = {(r.id_a, r.id_b) for r in got}
    assert len(planted & found) >= 18, planted - found  # recall >= 0.9


def test_kmeans_assign_picks_nearest_and_breaks_ties_by_cid(spark):
    corpus = spark.createDataFrame(
        [(10, [0.0, 0.0]), (11, [1.0, 1.0]), (12, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        "cid long, centroid array<float>",
    )
    out = {
        r.vec_id: (r.cid, r.dist)
        for r in similarity.assign_nearest_centroid(corpus, cents).collect()
    }
    assert out[10][0] == 0 and out[10][1] == 0.0
    assert out[11][0] == 1
    assert out[12][0] == 0  # equidistant -> lower cid wins


def test_kmeans_update_component_means(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 3.0]), (2, [3.0, 5.0]), (3, [10.0, 20.0])],
        "vec_id long, embedding array<float>",
    )
    assigned = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1)], "vec_id long, cid long"
    )
    rows = similarity.kmeans_update(assigned, corpus).collect()
    got = {(r.cid, r.pos): (r.n, r.mean) for r in rows}
    assert got[(0, 0)] == (2, 2.0) and got[(0, 1)] == (2, 4.0)
    assert got[(1, 0)] == (1, 10.0) and got[(1, 1)] == (1, 20.0)


def test_brute_force_topk_arrow_parity(spark):
    """The Arrow pandas-UDF cosine path must return the same top-k as
    the JVM higher-order-function path (quantized scores, id tiebreak) —
    the two implementations differ only in summation order, which the
    1e-6 floor-quantize absorbs."""
    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources.readers import (
        read_table,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    qvec = list(
        emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    )
    # include a zero vector: both paths must EXCLUDE it (NULL score, not
    # NaN — NaN would top Spark's descending sort in the Arrow path)
    zero = emb.sparkSession.createDataFrame(
        [(999999, [0.0] * len(qvec))], "vec_id long, embedding array<float>"
    )
    emb = emb.select("vec_id", "embedding").unionByName(zero)
    hof = similarity.brute_force_topk(emb, qvec, k=10).collect()
    arrow = similarity.brute_force_topk_arrow(emb, qvec, k=10).collect()
    assert [r.vec_id for r in hof] == [r.vec_id for r in arrow]
    assert 999999 not in {r.vec_id for r in arrow}
    for h, a in zip(hof, arrow):
        assert abs(h.cos_sim - a.cos_sim) < 1e-9


def test_multi_query_topk_matches_per_query_brute_force(spark):
    """Local-then-global top-k must be EXACT: for each query vector the
    batch operator returns the same set as the single-query brute force,
    regardless of partitioning."""
    from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.sources.readers import (
        read_table,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").repartition(7)
    qrows = emb.filter(F.col("vec_id") < 3).select("vec_id", "embedding").collect()
    queries = [(r.vec_id, [float(x) for x in r.embedding]) for r in qrows]
    batch = similarity.multi_query_topk(emb, queries, k=5)
    got = {
        qid: [(r.vec_id, r.cos_sim) for r in batch.filter(F.col("query_id") == qid)
              .orderBy(F.desc("cos_sim"), F.asc("vec_id")).collect()]
        for qid, _ in queries
    }
    for qid, qvec in queries:
        solo = [
            (r.vec_id, r.cos_sim)
            for r in similarity.brute_force_topk(emb, qvec, k=5).collect()
        ]
        # ids must agree exactly; scores to one quantization tick (the two
        # pipelines sum in different orders — BLAS matmul vs JVM fold —
        # and a last-ulp difference at a floor boundary moves 1e-6)
        assert [i for i, _ in got[qid]] == [i for i, _ in solo], qid
        for (_, a), (_, b) in zip(got[qid], solo):
            assert abs(a - b) <= 1.001e-6, (qid, a, b)


# ---------------------------------------------------- product quantization
def test_pq_encode_matches_numpy(spark):
    """Bit parity of BOTH PQ encoders — the pure-JVM struct-argmin path
    and the production Arrow path — against a numpy reference:
    normalize → per-subspace argmin (first-minimal-index tie rule) over
    seeded codebooks. Also pins the code shape contract: length m,
    every code in [0, k)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = similarity.make_pq_codebooks(64, m=8, k=16, seed=7)
    rows = (
        similarity.pq_encode(emb, cb)
        .select("vec_id", "embedding", "pq_code")
        .collect()
    )
    assert len(rows) == emb.count()  # no zero-norm rows in this table
    arrow = {
        r.vec_id: list(r.pq_code)
        for r in similarity.pq_encode_arrow(emb, cb)
        .select("vec_id", "pq_code")
        .collect()
    }
    assert {r.vec_id: list(r.pq_code) for r in rows} == arrow
    for r in rows[:200]:
        assert len(r.pq_code) == 8
        assert all(0 <= c < 16 for c in r.pq_code)
        v = np.asarray(list(r.embedding), dtype=np.float64)
        u = v / np.linalg.norm(v)
        ref = [
            int(((cb[s] - u[s * 8 : (s + 1) * 8]) ** 2).sum(axis=1).argmin())
            for s in range(8)
        ]
        assert ref == list(r.pq_code), r.vec_id


def test_pq_recall_at_10_clustered_corpus(spark, tmp_dir):
    """Recall@10 of the two-stage PQ search (ADC shortlist over the
    compact code index → exact cosine re-rank) with TRAINED codebooks on
    the planted-cluster corpus, 100 queries. Measured 1.000 at shortlist
    50 and 100 (m=8, k=16) — the re-rank recovers everything ADC's
    16-word-per-subspace quantization blurs; floor leaves noise margin.
    The shortlist is evaluated from Spark-encoded codes (the production
    path) with numpy doing only the per-query bookkeeping; three queries
    additionally run the full pq_topk_from_index Spark path end to end."""
    from tools.ann_recall import clustered_corpus, noisy_queries

    vecs = clustered_corpus()
    queries = noisy_queries(vecs, 100, 0.10, 13)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    cb = similarity.train_pq_codebooks(corpus, m=8, k=16, seed=42)
    enc = {
        r.vec_id: list(r.pq_code)
        for r in similarity.pq_encode(corpus, cb)
        .select("vec_id", "pq_code")
        .collect()
    }
    codes = np.asarray([enc[i] for i in range(len(vecs))])
    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    recalls = []
    for _qid, qv in queries:
        q = np.asarray(qv)
        qn = q / np.linalg.norm(q)
        exact = set(np.argsort(-(u @ qn))[:10])
        lut = similarity.pq_adc_lut(qv, cb)
        adc = lut[np.arange(8)[:, None], codes.T].sum(axis=0)
        short = np.argsort(adc)[:100]
        rerank = short[np.argsort(-(u[short] @ qn))][:10]
        recalls.append(len(exact & set(rerank)) / 10)
    assert float(np.mean(recalls)) >= 0.95, float(np.mean(recalls))

    # end-to-end through the persisted index + broadcast-shortlist join
    path = f"{tmp_dir}/pq_index"
    similarity.build_pq_index(corpus, cb, path)
    for _qid, qv in queries[:3]:
        q = np.asarray(qv)
        qn = q / np.linalg.norm(q)
        exact = set(int(i) for i in np.argsort(-(u @ qn))[:10])
        got = {
            r.vec_id
            for r in similarity.pq_topk_from_index(
                spark, path, corpus, qv, cb, k=10, shortlist=100
            ).collect()
        }
        assert len(exact & got) / 10 >= 0.9, (exact, got)
    corpus.unpersist()


def test_pq_batch_path_matches_single_query_path(spark, tmp_dir):
    """pq_multi_query_topk (one pass, all queries) must return exactly
    the per-query pq_topk_from_index results — same shortlists, same
    re-ranked (id, cos_sim) sets."""
    from tools.ann_recall import clustered_corpus, noisy_queries

    vecs = clustered_corpus(n_clusters=10, per_cluster=30)
    queries = noisy_queries(vecs, 5, 0.10, 13)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    cb = similarity.train_pq_codebooks(corpus, m=8, k=16, seed=42)
    path = f"{tmp_dir}/pq_batch_index"
    similarity.build_pq_index(corpus, cb, path)
    batch = similarity.pq_multi_query_topk(
        spark, path, corpus, queries, cb, k=5, shortlist=50
    ).collect()
    got = {}
    for r in batch:
        got.setdefault(r.query_id, []).append((r.vec_id, r.cos_sim))
    for qid, qv in queries:
        single = [
            (r.vec_id, r.cos_sim)
            for r in similarity.pq_topk_from_index(
                spark, path, corpus, qv, cb, k=5, shortlist=50
            ).collect()
        ]
        assert sorted(got[qid]) == sorted(single), qid
    corpus.unpersist()


def test_ivfpq_composed_index_recall_and_pruning(spark, tmp_dir):
    """The composed IVF-PQ index: cell partitions prune the scan
    (PartitionFilters on cid), what's scanned is compact codes, the
    exact re-rank recovers recall — ≥0.9 recall@10 on the clustered
    corpus at nprobe=2/shortlist=50 over 10 queries."""
    from tools.ann_recall import clustered_corpus, noisy_queries

    vecs = clustered_corpus(n_clusters=20, per_cluster=40)
    queries = noisy_queries(vecs, 10, 0.10, 13)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    ).cache()
    cents = similarity.train_ivf_centroids(
        corpus, n_centroids=8, sample=800, seed=42
    )
    cb = similarity.train_pq_codebooks(corpus, m=8, k=16, seed=42)
    path = f"{tmp_dir}/ivfpq"
    similarity.build_ivfpq_index(corpus, cents, cb, path)

    out = similarity.ivfpq_topk(
        spark, path, corpus, queries[0][1], cents, cb, k=10, nprobe=2,
        shortlist=50,
    )
    plan = formatted_plan(out)
    assert "PartitionFilters" in plan and "cid" in plan  # cells pruned

    u = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    recalls = []
    for _qid, qv in queries:
        q = np.asarray(qv)
        qn = q / np.linalg.norm(q)
        exact = set(int(i) for i in np.argsort(-(u @ qn))[:10])
        got = {
            r.vec_id
            for r in similarity.ivfpq_topk(
                spark, path, corpus, qv, cents, cb, k=10, nprobe=2,
                shortlist=50,
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    corpus.unpersist()


def test_mmr_rerank_defers_redundant_hits(spark):
    # hand-built geometry: the query's two most-relevant candidates are
    # near-duplicates of each other; plain top-k ranks them 1-2, MMR
    # (lambda=0.7) must defer the duplicate below the more-diverse
    # third candidate. Rank 1 is always the plain argmax (maxsim = 0).
    import math

    # v1 must differ from the query, else every candidate's maxsim
    # equals its rel after picking v1 and MMR degenerates to 4·rel
    # (relevance order preserved — the first draft of this test).
    rows = [
        (1, [0.98, 0.19899749, 0.0, 0.0]),  # top hit, rel .98
        (2, [0.95, 0.31224990, 0.0, 0.0]),  # near-dup of 1 (sim .993)
        (3, [0.93, 0.0, 0.36755952, 0.0]),  # diverse (sim to 1: .911)
        (4, [0.85, 0.0, 0.0, 0.52678269]),  # diverse, rel .85
        (5, [0.0, 1.0, 0.0, 0.0]),          # near-orthogonal filler
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = similarity.mmr_rerank_micro(
        corpus, [1.0, 0.0, 0.0, 0.0], k=5, shortlist=5
    ).collect()
    order = [r.vec_id for r in out]
    assert order[0] == 1
    assert out[0].maxsim_micro == 0
    # the near-dup (2) must NOT be second: its mmr 7*999000-3*~999k
    # loses to the diverse candidates
    assert order[1] != 2
    assert order.index(3) < order.index(2)
    # every step's mmr_deci is exactly 7*rel - 3*maxsim
    for r in out:
        assert r.mmr_deci == 7 * r.rel_micro - 3 * r.maxsim_micro
    # deterministic: re-run is identical
    again = similarity.mmr_rerank_micro(
        corpus, [1.0, 0.0, 0.0, 0.0], k=5, shortlist=5
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]


def test_mmr_rerank_bounded_by_corpus_and_excludes_zero_vectors(spark):
    # k larger than the (nonzero) corpus: the greedy stops when
    # candidates run out; zero vectors never appear (no direction)
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.0, 0.0]),  # zero vector — excluded
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = similarity.mmr_rerank_micro(corpus, [1.0, 0.0], k=10).collect()
    assert [r.vec_id for r in out] == [1, 2]
    assert [r.rank for r in out] == [1, 2]


def test_ivf_assign_arrow_matches_hof_argmin(spark):
    # the BLAS assignment path must agree with the bit-exact HOF path
    # whenever argmin margins are real (seeded gaussian data — the
    # documented contract; near-ties are measure-zero here)
    import numpy as np

    rng = np.random.RandomState(5)
    vecs = rng.randn(300, 16)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents = similarity.make_unit_planes(dim=16, n_planes=80, seed=11)
    hof = {
        r.vec_id: r.cid
        for r in similarity.ivf_assign(
            corpus, cents, "embedding"
        ).collect()
    }
    arrow = {
        r.vec_id: r.cid
        for r in similarity.ivf_assign_arrow(
            corpus, cents, "embedding"
        ).collect()
    }
    assert hof == arrow
    # and the input DataFrame's schema object is NOT mutated by the
    # fresh-StructType construction (regression: schema.add in place)
    assert [f.name for f in corpus.schema.fields] == ["vec_id", "embedding"]


def test_imi_assign_cells_compose_from_half_argmins(spark):
    import numpy as np

    rng = np.random.RandomState(9)
    vecs = rng.randn(200, 16)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    K = 6
    cb = similarity.make_imi_codebooks(16, K, seed=3)
    got = {
        r.vec_id: r.cid
        for r in similarity.imi_assign_arrow(
            corpus, cb, "embedding"
        ).collect()
    }
    cn = (cb**2).sum(axis=2)
    c1 = (cn[0][None, :] - 2.0 * (vecs[:, :8] @ cb[0].T)).argmin(axis=1)
    c2 = (cn[1][None, :] - 2.0 * (vecs[:, 8:] @ cb[1].T)).argmin(axis=1)
    want = c1 * K + c2
    assert all(got[i] == want[i] for i in range(len(vecs)))
    # codebooks are prefix-stable per half (the oracle slices i < K)
    big = similarity.make_imi_codebooks(16, K + 4, seed=3)
    assert np.array_equal(cb, big[:, :K, :])


def test_semantic_dedup_imi_same_contract_as_flat(spark):
    # planted duplicate pair: both quantizer legs must output the same
    # schema, cover every nonzero vector exactly once, and keep the
    # duplicate pair in one component whenever they share a cell
    import numpy as np

    rng = np.random.RandomState(21)
    vecs = rng.randn(120, 16)
    vecs[7] = vecs[3] + 0.01 * rng.randn(16)  # near-dup of 3
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cb = similarity.make_imi_codebooks(16, 3, seed=3)
    out = similarity.semantic_dedup_keep_imi(corpus, cb, threshold=0.9)
    pdf = out.toPandas()
    assert list(pdf.columns) == [
        "component", "n_members", "keep_id", "keep_cos_micro",
    ]
    assert pdf["n_members"].sum() == 120
    # 3 and 7 are cosine ~0.999: same half-argmins => same cell => merged
    comp = {int(r.component) for r in out.collect() if r.n_members > 1}
    dup = pdf[pdf["component"] == 3]
    assert len(dup) == 1 and int(dup["n_members"].iloc[0]) >= 2
    assert comp  # at least the planted pair merged


def test_semdedup_quantizer_retention_floors(spark):
    """Single-probe cell co-location of planted near-duplicates (cos
    ~0.93) — the SemDeDup recall trade, MEASURED and pinned: trained
    k-means centroids must beat the seeded prototype slate decisively
    (the production recall lever the operator's centroid parameter
    exists for), and both seeded legs must clear a sanity floor.
    Deterministic: fixed seeds everywhere."""
    import math

    import numpy as np
    import pandas as pd

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    v0 = np.asarray(emb["embedding"].tolist(), dtype=np.float64)
    rng = np.random.RandomState(99)
    dup = v0 + rng.randn(*v0.shape) * 0.05
    v = np.vstack([v0, dup])
    n = len(v)
    a = np.arange(len(v0))
    b = a + len(v0)

    k = max(16, n // 100)
    flat = similarity.make_unit_planes(64, k, 777)
    cid_flat = ((flat**2).sum(1)[None, :] - 2 * (v @ flat.T)).argmin(1)
    flat_ret = float((cid_flat[a] == cid_flat[b]).mean())

    K = max(4, math.ceil(math.sqrt(n / 100)))
    cb = similarity.make_imi_codebooks(64, K, 777)
    c1 = ((cb[0] ** 2).sum(1)[None, :] - 2 * (v[:, :32] @ cb[0].T)).argmin(1)
    c2 = ((cb[1] ** 2).sum(1)[None, :] - 2 * (v[:, 32:] @ cb[1].T)).argmin(1)
    cid_imi = c1 * K + c2
    imi_ret = float((cid_imi[a] == cid_imi[b]).mean())

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(v)],
        "vec_id long, embedding array<double>",
    )
    trained = similarity.train_ivf_centroids(
        corpus, n_centroids=k, sample=n, seed=42
    )
    cid_tr = ((trained**2).sum(1)[None, :] - 2 * (v @ trained.T)).argmin(1)
    tr_ret = float((cid_tr[a] == cid_tr[b]).mean())

    # the ORACLE-REPLAYABLE trainer (integer-micro Lloyd) must hold the
    # same recall class as float train_ivf_centroids — it is the gated
    # path (semantic_dedup_trained), so its floor is the r11 headline
    g_cents, g_cn = similarity.train_semdedup_centroids(
        corpus, k, sample=n, iters=4
    )
    cid_g = (g_cn[None, :] - 2 * (v @ g_cents.T)).argmin(1)
    gated_ret = float((cid_g[a] == cid_g[b]).mean())

    # sf0.001 measured: flat 0.734, imi 0.566, trained 0.926 (k=16,
    # K=4), integer-Lloyd gated 0.914; floors leave noise margin for
    # testdata regeneration
    assert flat_ret >= 0.5, flat_ret
    assert imi_ret >= 0.35, imi_ret
    assert tr_ret >= 0.8, tr_ret
    assert gated_ret >= 0.85, gated_ret
    assert tr_ret > flat_ret, (tr_ret, flat_ret)
    assert gated_ret > flat_ret, (gated_ret, flat_ret)

    # MULTI-PROBE retention (r10 verdict task 2 / r12): a pair is a
    # candidate when the two vectors' top-2 cell sets OVERLAP — the
    # boundary-split recovery semantic_dup_pairs_multiprobe gates.
    def ret2(scores):
        top2 = np.argsort(scores, axis=1, kind="stable")[:, :2]
        sa, sb = top2[a], top2[b]
        return float(
            (sa[:, :, None] == sb[:, None, :]).any(axis=(1, 2)).mean()
        )

    flat2 = ret2((flat**2).sum(1)[None, :] - 2 * (v @ flat.T))
    gated2 = ret2(g_cn[None, :] - 2 * (v @ g_cents.T))
    # IMI multi-probe: top-2 per HALF → the 4 (c1, c2) combos
    s1 = (cb[0] ** 2).sum(1)[None, :] - 2 * (v[:, :32] @ cb[0].T)
    s2 = (cb[1] ** 2).sum(1)[None, :] - 2 * (v[:, 32:] @ cb[1].T)
    t1 = np.argsort(s1, axis=1, kind="stable")[:, :2]
    t2 = np.argsort(s2, axis=1, kind="stable")[:, :2]
    cells = (
        t1[:, :, None] * K + t2[:, None, :]
    ).reshape(len(v), 4)
    ca, cbp = cells[a], cells[b]
    imi2 = float(
        (ca[:, :, None] == cbp[:, None, :]).any(axis=(1, 2)).mean()
    )
    # sf0.001 measured: flat 0.660→0.978, gated trained 0.914→0.998,
    # imi 0.614→0.998 — multi-probe recovers nearly all boundary
    # splits at ~4× the candidate-pair volume (SCALING.md)
    assert flat2 >= flat_ret and flat2 >= 0.85, (flat_ret, flat2)
    assert gated2 >= gated_ret and gated2 >= 0.95, (gated_ret, gated2)
    assert imi2 >= imi_ret and imi2 >= 0.7, (imi_ret, imi2)


def test_train_semdedup_centroids_deterministic_and_exact(spark):
    """The oracle-replayability contract of the integer-micro Lloyd
    trainer: (1) partition layout cannot move the result (the sample is
    a total order, the arithmetic exact integers); (2) centroids live
    exactly on the micro grid with cnorms_sq = Σmicro²/10¹² exactly;
    (3) the 2⁵³ exactness guard raises LOUDLY instead of silently
    handing DuckDB a rounded 'integer'."""
    import numpy as np
    import pytest

    rng = np.random.RandomState(5)
    vecs = rng.randn(300, 8) / np.sqrt(8)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    c1, n1 = similarity.train_semdedup_centroids(corpus, 8, sample=256)
    c2, n2 = similarity.train_semdedup_centroids(
        corpus.repartition(17), 8, sample=256
    )
    assert np.array_equal(c1, c2) and np.array_equal(n1, n2)
    u = np.round(c1 * 1e6)
    assert np.array_equal(c1, u / 1e6)  # exactly on the micro grid
    assert np.array_equal(n1, (u * u).sum(axis=1) / 1e12)
    with pytest.raises(ValueError, match="exact-integer contract"):
        similarity._lloyd_micro(
            np.full((4, 8), 2**30, dtype=np.int64), 2, 1
        )


def test_mmr_rerank_uses_raw_negative_maxsim(spark):
    """Canonical-MMR regression (r10 review finding): maxsim is the RAW
    max cosine to the selected set, negatives included — a candidate
    anti-correlated with everything picked gets a diversity BONUS. The
    first draft clamped at 0, silently diverging from the DuckDB
    recursive-CTE twin on any corpus where the query vector is not a
    corpus member (so sims to the selected set can be all-negative).
    Geometry: query = e2; the greedy must publish NEGATIVE
    maxsim_micro values and the exact integer objective."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.43588989, 0.0]),
        (2, [-0.5, 0.86602540, 0.0]),
        (3, [-0.5, -0.86602540, 0.0]),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = similarity.mmr_rerank_micro(
        corpus, [0.0, 1.0, 0.0], k=4, shortlist=4
    ).collect()
    got = [(r.rank, r.vec_id, r.maxsim_micro, r.mmr_deci) for r in out]
    # verified against the recursive-CTE oracle on this exact corpus
    assert got == [
        (1, 2, 0, 6062175),
        (2, 1, -72508, 3268754),
        (3, 0, 900000, -2700000),
        (4, 3, -500000, -4562175),
    ], got


def test_mmr_from_ivf_index_matches_full_scan_when_probing_all_cells(
    spark, tmp_path
):
    """The trained-index MMR serving path (r11 verdict task 1): with
    nprobe covering every cell, the partition-pruned probe sees the
    whole corpus and must reproduce mmr_rerank_micro ROW FOR ROW —
    same shortlist, same greedy, same integer objective."""
    rng = np.random.RandomState(11)
    vecs = rng.randn(400, DIM) / np.sqrt(DIM)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents, cn = similarity.train_semdedup_centroids(
        corpus, 4, sample=400, iters=4
    )
    path = str(tmp_path / "ivf_trained_idx")
    similarity.build_ivf_index(corpus, cents, path, cnorms_sq=cn)
    q = [float(x) for x in vecs[0]]
    full = similarity.mmr_rerank_micro(corpus, q, k=10, shortlist=50).collect()
    via_idx = similarity.mmr_from_ivf_index(
        spark, path, q, cents, k=10, shortlist=50,
        nprobe=len(cents), cnorms_sq=cn,
    ).collect()
    assert [tuple(r) for r in via_idx] == [tuple(r) for r in full]
    # determinism: the eager snapshot replays identically
    again = similarity.mmr_from_ivf_index(
        spark, path, q, cents, k=10, shortlist=50,
        nprobe=len(cents), cnorms_sq=cn,
    ).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in via_idx]


def test_mmr_from_ivf_index_serves_only_probed_cells(spark, tmp_path):
    """nprobe=1 must confine the result to members of the single
    nearest cell (IVF's own recall trade), and the index read must
    prune partitions — cid appears as a PartitionFilter, never a
    post-scan data filter."""
    rng = np.random.RandomState(13)
    vecs = rng.randn(300, DIM) / np.sqrt(DIM)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cents, cn = similarity.train_semdedup_centroids(
        corpus, 4, sample=300, iters=4
    )
    path = str(tmp_path / "ivf_trained_idx")
    similarity.build_ivf_index(corpus, cents, path, cnorms_sq=cn)
    q = [float(x) for x in vecs[5]]
    out = similarity.mmr_from_ivf_index(
        spark, path, q, cents, k=10, shortlist=50, nprobe=1, cnorms_sq=cn
    ).collect()
    # replicate the driver-side probe ranking and numpy assignment
    qv = np.asarray(q)
    probe = int(np.lexsort(
        (np.arange(len(cents)), cn - 2.0 * (cents @ qv))
    )[0])
    assign = (cn[None, :] - 2.0 * (vecs @ cents.T)).argmin(axis=1)
    members = {i for i in range(len(vecs)) if assign[i] == probe}
    assert out and all(r.vec_id in members for r in out)
    # the probe's relational shape: cid isin(...) over the partitioned
    # layout becomes a PartitionFilter on the scan
    pruned = spark.read.parquet(path).filter(F.col("cid").isin([probe]))
    plan = formatted_plan(pruned)
    assert "cid" in plan.split("PartitionFilters")[1][:200]


def test_knuth_key32_width_safe_and_engine_identical():
    """r11 verdict task 7: the naive id·2654435761 sample key overflows
    int64 at id ≳ 3.47e9 (Spark wraps silently, DuckDB promotes to
    HUGEINT → divergent training samples). knuth_key32 must equal the
    mathematically exact (id·C) mod 2³² at ANY id, in BOTH engines."""
    import duckdb

    ids = [
        0, 1, 12345, 2**31, 3_470_000_000, 2**32 - 1, 2**32,
        5_000_000_000, 2**40 + 17, 2**62,
    ]
    con = duckdb.connect()
    expr = similarity.knuth_key32_sql("v")
    for i in ids:
        want = (i * similarity.KNUTH_C) % 2**32
        got_sql = con.sql(
            f"SELECT {expr} AS k FROM (SELECT {i}::BIGINT AS v)"
        ).fetchone()[0]
        assert got_sql == want, (i, got_sql, want)


def test_knuth_key32_spark_matches_exact_math(spark):
    ids = [0, 7, 2**31 + 3, 3_470_000_000, 5_000_000_000, 2**40 + 17]
    df = spark.createDataFrame([(i,) for i in ids], "vec_id long")
    got = {
        r.vec_id: r.k
        for r in df.select(
            "vec_id", similarity.knuth_key32(F.col("vec_id")).alias("k")
        ).collect()
    }
    for i in ids:
        assert got[i] == (i * similarity.KNUTH_C) % 2**32, i


def test_trainer_sample_identical_at_billion_scale_ids(spark):
    """End-to-end pin of the width-safe key: a corpus whose ids sit
    past the old overflow bound must train the same centroids as a
    python replay of the exact (id·C) mod 2³² sample order."""
    rng = np.random.RandomState(17)
    n = 60
    vecs = rng.randn(n, DIM) / np.sqrt(DIM)
    ids = [5_000_000_000 + 977 * j for j in range(n)]
    corpus = spark.createDataFrame(
        [(ids[j], [float(x) for x in vecs[j]]) for j in range(n)],
        "vec_id long, embedding array<double>",
    )
    cents, cn = similarity.train_semdedup_centroids(
        corpus, 4, sample=16, iters=2
    )
    order = sorted(
        range(n),
        key=lambda j: ((ids[j] * similarity.KNUTH_C) % 2**32, ids[j]),
    )
    u = np.floor(vecs[order[:16]] * 1e6 + 0.5).astype(np.int64)
    expect = similarity._lloyd_micro(u, 4, 2)
    assert np.array_equal(cents, expect.astype(np.float64) / 1e6)
    assert np.array_equal(
        cn, (expect * expect).sum(axis=1).astype(np.float64) / 1e12
    )


def test_lloyd_micro_empty_input_returns_empty_slate():
    """r11 advisor: an all-zero-vector or empty corpus reaches
    _lloyd_micro as a size-0 array — it must return an empty slate,
    not raise an opaque IndexError on u.shape[1]."""
    out = similarity._lloyd_micro(np.zeros((0, DIM), dtype=np.int64), 4, 2)
    assert out.shape == (0, DIM)
    out1d = similarity._lloyd_micro(np.array([], dtype=np.int64), 4, 2)
    assert out1d.size == 0


def test_semantic_dup_pairs_multiprobe_imi_matches_numpy_oracle(spark):
    """The IMI multi-probe pair generator must produce EXACTLY the
    candidate pairs a numpy replay derives (top-2 cells per half →
    4 (c1,c2) combos, pair = any shared cell, verify = quantized
    cosine ≥ threshold) — and strictly contain the single-probe
    (argmin cell) pair set on a corpus with boundary splits."""
    import math

    rng = np.random.RandomState(23)
    n0 = 120
    v0 = rng.randn(n0, DIM) / np.sqrt(DIM)
    dup = v0 + rng.randn(n0, DIM) * 0.05
    v = np.vstack([v0, dup])
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(v)],
        "vec_id long, embedding array<double>",
    )
    K = 4
    cb = similarity.make_imi_codebooks(DIM, K, seed=31)
    got = {
        (r.id_a, r.id_b)
        for r in similarity.semantic_dup_pairs_multiprobe_imi(
            corpus, cb, threshold=0.4, nprobe_per_half=2
        ).collect()
    }
    # numpy replay
    dh = DIM // 2
    cn = (cb**2).sum(axis=2)
    s1 = cn[0][None, :] - 2 * (v[:, :dh] @ cb[0].T)
    s2 = cn[1][None, :] - 2 * (v[:, dh:] @ cb[1].T)
    t1 = np.argsort(s1, axis=1, kind="stable")[:, :2]
    t2 = np.argsort(s2, axis=1, kind="stable")[:, :2]
    cells = (t1[:, :, None] * K + t2[:, None, :]).reshape(len(v), 4)
    u = v / np.sqrt((v * v).sum(axis=1))[:, None]
    want = set()
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            if len(set(cells[i]) & set(cells[j])):
                cm = math.floor(float(u[i] @ u[j]) * 1e6 + 0.5)
                if cm >= 400000:
                    want.add((i, j))
    assert got == want
    # single-probe (argmin cells) pairs are a strict subset here
    cid = (s1.argmin(1) * K + s2.argmin(1))
    single = {
        (i, j)
        for i in range(len(v))
        for j in range(i + 1, len(v))
        if cid[i] == cid[j]
        and math.floor(float(u[i] @ u[j]) * 1e6 + 0.5) >= 400000
    }
    assert single <= got and len(got) > len(single)


def test_dim_truncation_recall_matches_numpy_reference(spark):
    """The Matryoshka truncation audit against an unpruned numpy third
    implementation (the pq multi-index precedent): identical
    micro-quantized truncated cosines, identical (cos DESC, vec_id)
    top-10 cuts, identical hit counts per dim; the 64-dim row is the
    identity check at exactly 1e6 recall and the ladder's laws hold
    (hits bounded, queries counted)."""
    import numpy as np

    import __spark_entry__ as entrymod

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r.dim: r
        for r in entrymod.queries()["dim_truncation_recall"](
            spark, sf_dir
        ).collect()
    }

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id")
        .collect()
    )
    X = np.asarray([[float(x) for x in r.embedding] for r in emb])
    ids = np.asarray([r.vec_id for r in emb])
    Q = X[:32]
    tops = {}
    for d in (8, 16, 32, 64):
        Xd, Qd = X[:, :d], Q[:, :d]
        xn = np.sqrt((Xd * Xd).sum(axis=1))
        qn = np.sqrt((Qd * Qd).sum(axis=1))
        for qi in range(32):
            cos = (Xd @ Qd[qi]) / (xn * qn[qi])
            cm = np.floor(cos * 1e6 + 0.5).astype(np.int64)
            order = sorted(
                range(len(ids)), key=lambda j: (-cm[j], ids[j])
            )[:10]
            tops[(d, qi)] = {int(ids[j]) for j in order}
    for d in (8, 16, 32, 64):
        hits = sum(
            len(tops[(d, qi)] & tops[(64, qi)]) for qi in range(32)
        )
        g = got[d]
        assert g.n_queries == 32
        assert g.sum_hits == hits
        assert g.recall_ppm == (hits * 1_000_000) // 320
        assert 0 <= g.sum_hits <= 320
    assert got[64].sum_hits == 320 and got[64].recall_ppm == 1_000_000
    # the testdata embeddings are isotropic (no Matryoshka training),
    # so truncation MUST lose neighborhoods — the audit's whole point
    # is surfacing that these vectors cannot be served short — and the
    # ladder recovers recall monotonically on this deterministic corpus
    assert (
        got[8].recall_ppm
        < got[16].recall_ppm
        < got[32].recall_ppm
        < got[64].recall_ppm
    )
