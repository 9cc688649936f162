"""Scaling-evidence harness: how do the document operators behave as the
corpus grows, duplicate structure held constant?

Builds k× replicas of sf0.1/documents.parquet (k in 1, 4, 16 by default).
Replica 0 is the original; replica i>0 interleaves a replica-unique token
every 5 words, which destroys ~3/5 of each doc's 3-shingles — so replicas
are NOT near-duplicates of their base or of each other, and the near-dup
rate per unit of corpus stays constant while the corpus grows. (Naive
"copy the table k times" instead grows every duplicate cluster to size k,
which measures quadratic pair output, not engine scaling.)

Timed per k: exact dedup, MinHash-LSH pairs, SimHash candidates, token
counts, quality scores, and the end-to-end curation pipeline (~30s at
k=32). Map-only queries are timed through the noop sink — a bare
.count() lets Catalyst prune their projection down to a parquet
metadata count, timing the scan instead of the operator; aggregating
queries are timed via .count(), which cannot be pruned. Writes
SCALING.md (preserving foreign trailing sections).

Usage: python tools/stress_scaling.py [k ...]   (default: 1 4 16)
"""

from __future__ import annotations

import json
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

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".benchmarks", "stress")
TIMED = [
    # map-only queries first: measured before the heavy dedup self-joins
    # fill the JVM with shuffle/GC pressure that inflates their times
    "doc_token_counts",
    "quality_scores",
    "exact_dedup_docs",
    "minhash_dedup_pairs",
    "simhash_candidates",
    "corpus_pipeline_end2end",
    # round-6 document operators
    "gopher_quality_rules",
    "langid_trigram",
    "dedup_keep_best",
    # round-7 document operators
    "passage_dedup_stats",
    "doremi_domain_weights",
    # r8: the streaming twin of passage dedup — micro-batch file-stream
    # driven to completion, bounded per-batch state
    "streaming_passage_dedup",
    # r14: C4-style corpus-frequency boilerplate removal — one more
    # fp-keyed census + verdict join over the same chunking as passage
    # dedup; must track the corpus ~linearly
    "boilerplate_scrub",
    # r15 capstone: scrub → dedup → trained-BPE encode → 2048-token
    # pack → shard manifest; the per-k _bpe_trained artifact builds
    # once inside the (untimed) query-construction call — the
    # production amortized shape — so the timed reps measure the
    # five-stage manifest plan itself
    "pretrain_shard_plan",
    # r15 corpus-QA: Heaps curve + Zipf slope — one vocabulary-sized
    # groupBy (first-occurrence design, no per-checkpoint distincts),
    # must track the corpus ~linearly with a shrinking constant as the
    # vocabulary saturates
    "vocab_growth_zipf_profile",
    # r15 corpus-QA: per-language BPE fertility — the corpus-sized
    # work is one (lang, word) groupBy; the dictionary join runs on
    # the vocab-sized aggregate, so the constant should shrink as the
    # vocabulary saturates (the same favorable regime)
    "tokenizer_fertility_report",
    # r15 corpus-QA: cross-source shingle leakage — the distinct
    # (source, gram) census + a self-join whose per-gram multiplicity
    # is structurally capped at |sources|; replicas inject
    # replica-unique shingles, so the gram table grows ~linearly and
    # the join must track it
    "source_overlap_matrix",
]
#: queries whose .count() Catalyst can prune into near-no-ops (narrow
#: maps, and aggregates whose expensive agg expressions — text-derived
#: quality/verdict columns — drop out when only the count is needed):
#: timed via the noop sink, which materializes EVERY column
MAP_ONLY = {
    "doc_token_counts",
    "quality_scores",
    "gopher_quality_rules",
    "dedup_keep_best",
    # a bare .count() would let Catalyst drop the kept_text rebuild
    # (array_sort + concat_ws agg expressions) — the noop sink forces it
    "passage_dedup_stats",
    "boilerplate_scrub",
    # a bare .count() on the manifest would prune the doc_ids /
    # source_mix collect_list rebuilds — the noop sink materializes them
    "pretrain_shard_plan",
    # 10-row output: .count() could prune the slope regression and the
    # cumulative values — the noop sink forces both
    "vocab_growth_zipf_profile",
}


def build_corpus(spark, k: int) -> str:
    """k× documents with constant near-dup density; other tables symlinked."""
    out_dir = f"{OUT}/x{k}"
    if os.path.exists(f"{out_dir}/_built"):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n = docs.count()
    rep = docs.withColumn("__rep", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
    words = F.split(F.trim(F.col("text")), r"\s+")
    # interleave a replica-unique marker every 5 words (replica 0 untouched)
    perturbed = F.array_join(
        F.flatten(
            F.transform(
                words,
                lambda w, p: F.when(
                    (p % 5 == 0) & (F.col("__rep") > 0),
                    F.array(
                        # unique per (doc, replica, position): shared
                        # markers would dominate simhash bit votes and
                        # collapse every replica into one candidate bucket
                        F.concat(
                            F.lit("zz"),
                            F.col("__rep").cast("string"),
                            F.lit("d"),
                            F.col("doc_id").cast("string"),
                            F.lit("p"),
                            p.cast("string"),
                        ),
                        w,
                    ),
                ).otherwise(F.array(w)),
            )
        ),
        " ",
    )
    (
        rep.withColumn("doc_id", F.col("doc_id") + F.col("__rep") * n)
        .withColumn("text", perturbed)
        .withColumn("n_chars", F.length("text"))
        .drop("__rep")
        .coalesce(8 * k)
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        os.symlink(f"{BASE}/{t}.parquet", f"{out_dir}/{t}.parquet")
    open(f"{out_dir}/_built", "w").write("ok")
    return out_dir


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="stress-scaling")
    qs = entrymod.queries()
    # JVM/codegen warmup so k=1 times aren't inflated by first-query startup
    for name in TIMED:
        qs[name](spark, "/root/testdata/sf0.001").count()
    results: dict[int, dict] = {}
    for k in ks:
        sf_dir = build_corpus(spark, k)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        row: dict = {"n_docs": n_docs, "times": {}}
        for name in TIMED:
            # the timer starts BEFORE the query function: batch queries
            # only build a lazy plan there (~ms), but STREAMING queries
            # drive their micro-batches to completion inside the call —
            # timing only the memory-sink count() flat-lined
            # streaming_passage_dedup at 0.1s whatever the corpus size
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            if name in MAP_ONLY:
                # noop sink materializes EVERY column — .count() on a
                # map-only projection prunes to a parquet metadata count
                # and times the scan, not the operator. Best of 2 reps:
                # sub-second map stages are GC-noise-sensitive
                reps = []
                for _ in range(2):
                    r0 = time.time()
                    df.write.format("noop").mode("overwrite").save()
                    reps.append(time.time() - r0)
                row["times"][name] = round(min(reps), 3)
                # cardinality unchanged by a projection: the cheap
                # metadata count is the correct row count
                row.setdefault("out_rows", {})[name] = df.count()
            else:
                # aggregations/joins cannot be pruned by count(): the
                # count IS the full computation, and doubles as out_rows
                out_rows = df.count()
                row["times"][name] = round(time.time() - t0, 3)
                row.setdefault("out_rows", {})[name] = out_rows
        results[k] = row
        print(json.dumps({"k": k, **row}))
        # no silent caps: a timed query returning zero rows is almost
        # certainly reading nothing (e.g. a staging path that missed the
        # directory-shaped corpus) — fail the run rather than shipping a
        # flat-line scaling row
        empty = [n for n, r in row["out_rows"].items() if r == 0]
        if empty:
            raise SystemExit(
                f"zero output rows at k={k} for {empty} — "
                "harness/staging bug, not a measurement"
            )

    lines = [
        "# SCALING — corpus-growth behavior of the document operators",
        "",
        "Generated by `tools/stress_scaling.py`: sf0.1 documents replicated",
        "k×, each replica perturbed by a replica/doc/position-unique marker",
        "token interleaved every 5 words. The perturbation is metric-aware:",
        "",
        "- **3-shingle Jaccard** (MinHash's metric) drops to ~0.25 — replicas",
        "  are NOT near-dups for MinHash, so its true-pair count stays ~flat",
        "  and its row measures *pure corpus scaling at fixed dup volume*.",
        "- **bag-of-words similarity** (SimHash's metric) stays high — every",
        "  base doc gains k-1 genuine SimHash near-dups, so its row measures",
        "  scaling *while true-duplicate volume explodes* (the hostile case:",
        "  candidate output grows ~k× faster than the corpus).",
        "",
        "Linear-ish wall-time growth on both rows means the banded self-joins",
        "stay candidate-bounded (id-only shuffles, capped buckets) instead of",
        "going quadratic in either regime.",
        "",
        "| query | " + " | ".join(f"k={k} ({results[k]['n_docs']} docs)"
                                   for k in ks) + " | growth vs corpus |",
        "|---|" + "---|" * (len(ks) + 1),
    ]
    for name in TIMED:
        ts = [results[k]["times"][name] for k in ks]
        ratio = (ts[-1] / ts[0]) / (ks[-1] / ks[0]) if ts[0] > 0 else 0
        lines.append(
            f"| {name} | " + " | ".join(f"{t:.2f}s" for t in ts)
            + f" | {ratio:.2f}× linear |"
        )
    lines += [
        "",
        "`growth vs corpus` = (time at max k / time at k=1) ÷ (corpus ratio):",
        "1.0 = perfectly linear scaling, <1 = sublinear (fixed overheads",
        "amortizing), >1 = superlinear (a scale bottleneck).",
        "",
        "Output rows across k (MinHash ~flat by design; SimHash explodes by",
        "design while its time stays ~linear):",
        "",
    ] + [
        f"- `{name}`: "
        + " → ".join(str(results[k]["out_rows"][name]) for k in ks)
        for name in ("exact_dedup_docs", "minhash_dedup_pairs",
                     "simhash_candidates")
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.md")
    # preserve sections other tools append (e.g. the skew-join evidence):
    # this harness emits no H2 headings, so the first "\n## " in the old
    # file marks foreign content
    tail = ""
    if os.path.exists(path):
        prev = open(path).read()
        marker = prev.find("\n## ")
        if marker != -1:
            tail = prev[marker:]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n" + tail)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
