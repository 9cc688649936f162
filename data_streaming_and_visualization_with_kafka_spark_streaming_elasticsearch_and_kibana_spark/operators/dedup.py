"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-conscious:
  exact        — md5-fingerprint groupBy (one shuffle on the hash; the
                 hash is computed map-side so the shuffle carries 32 bytes
                 + keys, not the document text)
  minhash-LSH  — shingle → minhash signature → banded bucket join; only
                 same-bucket pairs are compared, so candidate generation
                 is O(docs × bands), not O(docs²)
  simhash      — 64-bit signature; near-dup via Hamming ≤ 3 found by
                 exact match on one of 4 16-bit chunks (pigeonhole)
  ngram-jaccard— exact verification on candidate pairs

All signatures are built from built-in expressions (xxhash64, transform,
aggregate) — JVM-side, no Python in the hot path. At 100 TB the only
shuffles are the bucket joins, each keyed on a well-distributed hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import normalized_fingerprint, shingles


# ------------------------------------------------------------------ exact
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint.

    Returns (fingerprint, keep_id, dup_count). Equivalent semantics to
    groupBy(md5(norm(text))) — one shuffle, partial agg map-side.
    """
    return (
        df.select(normalized_fingerprint(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


# ---------------------------------------------------------------- jaccard
def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two array<string> shingle sets."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


# ---------------------------------------------------------------- minhash
def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: sig[i] = min over shingles of xxhash64(i, s).

    Seeding by prepending the hash index as a column gives num_hashes
    independent hash families from one built-in function.
    """
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.transform(
        idx,
        lambda i: F.array_min(
            F.transform(shingle_col, lambda s: F.xxhash64(i, s))
        ),
    )


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash-LSH.

    rows = num_hashes / bands hashes per band; docs agreeing on ALL rows
    of any band land in the same bucket. The bucket join shuffles on
    (band_idx, band_hash) — well distributed, no O(n²) compare.
    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduped across
    bands, est_jaccard = signature agreement rate.
    """
    rows = num_hashes // bands
    sig_df = df.select(
        F.col(id_col),
        minhash_signature(shingles(text_col, k_shingle), num_hashes).alias("sig"),
    )
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sig_df.select(
        id_col,
        "sig",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(F.concat_ws(",", F.slice("sig", b * rows + 1, rows))).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        (agree.cast("double") / F.lit(len(range(num_hashes)))).alias("est_jaccard"),
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    **lsh_kwargs,
) -> DataFrame:
    """Candidates → exact-Jaccard verification ≥ threshold.

    The verify join re-attaches shingle sets only for candidate ids
    (semi-join sized, not corpus sized).
    """
    cands = minhash_lsh_candidates(df, text_col, id_col, **lsh_kwargs)
    sh = df.select(
        F.col(id_col), shingles(text_col).alias("sh")
    )
    return (
        cands.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- simhash
def simhash64(token_col: Column, n_bits: int = 64) -> Column:
    """64-bit SimHash of an array<string> token column.

    bit b of the signature = sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1).
    Token hashes are computed ONCE into an array, then each bit weight is
    an `aggregate` over that array — all built-in expressions, no UDF.
    (Bit indices are Python ints because shift amounts must be literals.)
    """
    hashes = F.transform(token_col, lambda t: F.xxhash64(t))

    def bit_weight(b: int) -> Column:
        # factory so the lambda stays 2-arg (pyspark maps extra params to
        # lambda variables) and `b` is a Python literal
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )

    sig = F.lit(0).cast("long")
    for b in range(n_bits):
        sig = sig.bitwiseOR(
            F.when(bit_weight(b) > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def simhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hamming-≤3 candidate pairs by pigeonhole on 4×16-bit chunks:
    any pair within distance 3 agrees exactly on ≥1 chunk → equi-join
    per chunk, union, dedup. Shuffle key = (chunk_idx, chunk_value).
    Returns (id_a, id_b, hamming).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    sig = df.select(F.col(id_col), simhash64(toks).alias("sig"))
    chunked = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("sig", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("cval"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select(id_col, "sig", "cc.chunk", "cc.cval")
    a, b = chunked.alias("a"), chunked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.cval") == F.col("b.cval"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    xor = F.col("sig_a").bitwiseXOR(F.col("sig_b"))
    return pairs.select("id_a", "id_b", F.bit_count(xor).alias("hamming"))
