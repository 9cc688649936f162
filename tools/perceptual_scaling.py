"""Scaling evidence for the perceptual near-dup family (image dHash /
audio energy contour / video shared frames): does pair-finding wall
time stay ~linear as the media corpus grows?

The gated catalog queries run on a BOUNDED fixture (doc_id < 200 at
every sf) so the driver's per-round timing says nothing about corpus
growth; this harness is the scale witness. Corpus construction: k×
replicas of the sf0.1 documents table (5,000 → 20,000 → 80,000 base
images), each replica salting the md5 authoring chain with its replica
id so images are distinct ACROSS replicas while every replica plants
the same in-replica near-dup structure (1/4 of docs get a
brightness-shifted copy → hamming-0 pairs; duplicate volume per unit
of corpus stays constant, so the harness measures engine scaling, not
pair-output growth).

What must hold for the 100 TB claim: the pigeonhole candidate join is
Σ bucket² over 16-bit-chunk buckets — random signatures spread over
65,536 values per chunk, so with bounded planted-dup cluster sizes the
join stays ~linear in media count; signatures are 4 ints per image
(the corpus-sized state is TINY next to the media bytes, which stream
through mapInPandas exactly once).

Usage: python tools/perceptual_scaling.py [k ...]   (default: 1 4 16)
Writes one markdown row per k; paste into SCALING.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (  # noqa: E402,E501
    get_spark,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.operators import (  # noqa: E402,E501
    multimodal,
)

SF = "/root/testdata/sf0.1"


def media_corpus(spark, k: int):
    """k replicas of the documents table as authored 9×8 PGM images,
    ~25% of them with a planted brightness-shifted near-dup."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = []
    n_docs = docs.count()
    for r in range(k):
        rep = docs.select(
            (F.col("doc_id") + F.lit(r * n_docs * 2)).alias("media_id"),
            F.concat(F.col("text"), F.lit(f"#rep{r}")).alias("seed"),
            F.lit(0).alias("shift"),
        )
        dup = docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + F.lit(r * n_docs * 2 + n_docs)).alias(
                "media_id"
            ),
            F.concat(F.col("text"), F.lit(f"#rep{r}")).alias("seed"),
            F.lit(32).alias("shift"),
        )
        reps += [rep, dup]
    allm = reps[0]
    for m in reps[1:]:
        allm = allm.unionByName(m)
    raw = F.concat(
        *[
            F.unhex(F.md5(F.concat(F.col("seed"), F.lit(s))))
            for s in ["", "x", "y", "z", "w"]
        ]
    )
    authored = allm.select("media_id", raw.alias("m"), "shift")

    def _author(it):
        import pandas as pd

        for pdf in it:
            content = [
                b"P5\n9 8\n255\n"
                + bytes(x % 192 + int(dv) for x in bytes(m)[:72])
                for m, dv in zip(pdf["m"], pdf["shift"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content": content,
                }
            )

    return authored.repartition(32).mapInPandas(
        _author, "media_id long, content binary"
    )


def run(spark, k: int) -> dict:
    media = media_corpus(spark, k).persist()
    n = media.count()  # materialize authoring outside the timed region
    t0 = time.perf_counter()
    sigs = multimodal.image_dhash_chunks(media)
    pairs = multimodal.dhash_near_dup_pairs(sigs)
    n_pairs = pairs.count()
    dt = time.perf_counter() - t0
    media.unpersist()
    return {"k": k, "media": n, "pairs": n_pairs, "sec": round(dt, 2)}


def run_bulk(spark, k: int) -> dict:
    """r13 bulk-gate witness: build the MIH index over the k× corpus,
    then sweep EVERY signature through mih_bulk_topk (exclude_self) —
    the full batch ingest gate. Index build is timed separately from
    the probe sweep; planted dup volume per unit of corpus is constant
    so hit output grows ~linearly with media."""
    import shutil
    import tempfile

    media = media_corpus(spark, k).persist()
    media.count()
    sigs = multimodal.image_dhash_chunks(media).localCheckpoint(eager=True)
    media.unpersist()
    n = sigs.count()
    path = tempfile.mkdtemp(prefix=f"mih_bulk_scale_{k}_")
    try:
        t0 = time.perf_counter()
        multimodal.build_mih_index(sigs, path, cb_bits=8)
        build = time.perf_counter() - t0
        queries = sigs.select(
            F.col("media_id").alias("query_id"), "c0", "c1", "c2", "c3"
        )
        t0 = time.perf_counter()
        hits = multimodal.mih_bulk_topk(
            spark, path, queries, k=5, max_hamming=3, cb_bits=8,
            exclude_self=True,
        ).count()
        probe = time.perf_counter() - t0
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return {
        "k": k,
        "media": n,
        "hits": hits,
        "build_sec": round(build, 2),
        "probe_sec": round(probe, 2),
    }


def video_corpus(spark, k: int):
    """k replicas of 8-frame VID0 videos (suffix-salted md5 frames)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    reps = []
    for r in range(k):
        reps.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * n_docs)).alias("media_id"),
                F.concat(F.col("text"), F.lit(f"#v{r}")).alias("seed"),
            )
        )
    allv = reps[0]
    for m in reps[1:]:
        allv = allv.unionByName(m)
    frames = F.array(
        *[
            F.concat(
                *[
                    F.unhex(
                        F.md5(F.concat(F.col("seed"), F.lit(f"f{j}{s}")))
                    )
                    for s in ["", "x", "y", "z", "w"]
                ]
            )
            for j in range(8)
        ]
    )
    authored = allv.select("media_id", frames.alias("fr"))

    def _author(it):
        import pandas as pd

        for pdf in it:
            content = [
                multimodal.encode_video_frames(
                    [
                        b"P5\n9 8\n255\n" + bytes(x % 192 for x in bytes(m)[:72])
                        for m in fr
                    ]
                )
                for fr in pdf["fr"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "content": content,
                }
            )

    return authored.repartition(32).mapInPandas(
        _author, "media_id long, content binary"
    )


def run_video(spark, k: int) -> dict:
    """r13 strided-index witness: the stride-2 walk must cost ~half
    the full walk (unsampled frames skip decode+hash entirely)."""
    media = video_corpus(spark, k).persist()
    n = media.count()
    t0 = time.perf_counter()
    multimodal.video_frame_dhash(media).count()
    full = time.perf_counter() - t0
    t0 = time.perf_counter()
    multimodal.video_frame_dhash(media, stride=2).count()
    strided = time.perf_counter() - t0
    media.unpersist()
    return {
        "k": k,
        "videos": n,
        "full_sec": round(full, 2),
        "strided_sec": round(strided, 2),
        "ratio": round(strided / full, 2) if full else float("nan"),
    }


def main() -> None:
    args = sys.argv[1:]
    mode = "pairs"
    if args and args[0] in ("pairs", "bulk", "video"):
        mode = args.pop(0)
    ks = [int(a) for a in args] or [1, 4, 16]
    spark = get_spark(app_name="perceptual-scaling")
    if mode == "bulk":
        run_bulk(spark, 1)  # warmup
        rows = [run_bulk(spark, k) for k in ks]
        print("| k | media rows | gate hits | index build s | bulk probe s | probe growth vs linear |")
        print("|---|---|---|---|---|---|")
        base = rows[0]
        for r in rows:
            lin = (
                r["probe_sec"] / base["probe_sec"] / (r["media"] / base["media"])
                if base["probe_sec"]
                else float("nan")
            )
            print(
                f"| {r['k']} | {r['media']} | {r['hits']} | {r['build_sec']} "
                f"| {r['probe_sec']} | {lin:.2f}x |"
            )
        return
    if mode == "video":
        run_video(spark, 1)  # warmup
        rows = [run_video(spark, k) for k in ks]
        print("| k | videos (8 frames) | full walk s | stride-2 walk s | strided/full |")
        print("|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['k']} | {r['videos']} | {r['full_sec']} "
                f"| {r['strided_sec']} | {r['ratio']}x |"
            )
        return
    run(spark, 1)  # warmup
    rows = [run(spark, k) for k in ks]
    base = rows[0]
    print("| k | media rows | hamming<=3 pairs | hash+pair sec | growth vs linear |")
    print("|---|---|---|---|---|")
    for r in rows:
        lin = (
            r["sec"] / base["sec"] / (r["media"] / base["media"])
            if base["sec"]
            else float("nan")
        )
        print(
            f"| {r['k']} | {r['media']} | {r['pairs']} | {r['sec']} "
            f"| {lin:.2f}x |"
        )


if __name__ == "__main__":
    main()
