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


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark(app_name="perceptual-scaling")
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
