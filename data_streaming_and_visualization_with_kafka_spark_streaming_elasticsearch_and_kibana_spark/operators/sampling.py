"""Deterministic hash-based sampling, splitting, sharding and packing.

Extension tier (no counterpart in the reference beyond the pandas
``sample(frac=1)`` shuffle at ``dataframe_to_kafka.py:58``): a training-data
pipeline at 100 TB needs *reproducible* subsets. ``rand()`` is useless there —
it changes across retries, speculative duplicates, and partition layouts — so
every operator here keys on a content hash instead:

    bucket(key) = first 8 hex chars of md5(seed || ':' || key)

which is uniform on [0, 16^8), stable across runs and engines, and cheap
(one JVM-side md5 per row, no shuffle). Splits compare the hex prefix
lexicographically against a precomputed threshold string, so the assignment
is a pure narrow map — filter-pushdown-friendly and embarrassingly parallel.

All operators are pure Column expressions (whole-stage codegen, no UDFs)
and add exactly zero shuffles beyond any aggregation the caller asks for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX_SPACE = 16 ** 8


def hash_hex(key: Column, seed: str) -> Column:
    """First 8 lowercase-hex chars of md5(seed:key) — a stable uniform bucket."""
    return F.substring(F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string"))), 1, 8)


def rate_threshold(rate: float) -> str:
    """Hex string h such that P[hash_hex(k) < h] == rate (up to 1/16^8)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * HEX_SPACE), HEX_SPACE - 1), "08x")


def hash_split(
    df: DataFrame,
    key_col: str,
    rate: float | dict[str, float],
    stratum_col: str | None = None,
    seed: str = "split",
    names: tuple[str, str] = ("train", "holdout"),
) -> DataFrame:
    """Deterministic train/holdout split keyed on md5(key).

    ``rate`` may be a single fraction or, with ``stratum_col``, a
    per-stratum dict (stratified split — e.g. keep 90% of English but
    only 50% of a low-resource language). Rows hash to the same side on
    every run, engine, and cluster size; no state, no shuffle.
    """
    h = hash_hex(F.col(key_col), seed)
    if isinstance(rate, dict):
        if stratum_col is None:
            raise ValueError("per-stratum rates require stratum_col")
        expr: Column = F.lit(names[1])
        for stratum, r in sorted(rate.items()):
            expr = F.when(
                (F.col(stratum_col) == stratum) & (h < rate_threshold(r)),
                names[0],
            ).otherwise(expr)
    else:
        expr = F.when(h < rate_threshold(rate), names[0]).otherwise(names[1])
    return df.withColumn("split", expr)


def shard_assign(
    df: DataFrame, key_col: str, n_shards: int, seed: str = "shard"
) -> DataFrame:
    """Stable output-shard id in [0, n_shards) from the key hash.

    Use as the partition column of the final ``write.partitionBy`` so a
    re-run lands every document in the same shard file — required for
    resumable 100-TB materializations.
    """
    bucket = F.conv(hash_hex(F.col(key_col), seed), 16, 10).cast("long")
    return df.withColumn("shard", (bucket % n_shards).cast("int"))


def contiguous_pack(
    df: DataFrame,
    token_col: str,
    budget: int,
    order_col: str,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign each row a pack ``bin`` by cutting the ordered stream of
    token counts at multiples of ``budget`` (a document is binned where
    its tokens *start*). This is the deterministic contiguous variant of
    sequence packing for LLM pretraining: exact first-fit is inherently
    sequential, but contiguous packing is a single window cumsum — one
    shuffle on the partition keys, scale-free.

    At 100 TB, partition on a bounded-cardinality key (language, source,
    shard id) so each window partition fits an executor; the cumsum is
    O(rows) per partition with no additional passes.
    """
    w = (
        Window.partitionBy(*[F.col(c) for c in partition_cols])
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(token_col)).over(w)
    return df.withColumn(
        "bin", F.floor((cum - F.col(token_col)) / F.lit(budget)).cast("long")
    )


def temperature_weights(
    docs: DataFrame, lang_col: str = "lang", alpha: float = 0.5
) -> DataFrame:
    """Per-language temperature sampling weights (XLM line): corpus
    share p, normalized weight w ∝ p^alpha, upsample factor u = w/p.
    Returns (lang, n_docs, p, w, u) — lang-cardinality rows, so every
    aggregate here is broadcast-sized; the doc-count groupBy is the one
    full-data pass. alpha=0.5 routes through sqrt, which is IEEE-
    correctly-rounded in every engine (other alphas use pow, whose
    last-ulp libm differences can flip a downstream quantization tick —
    fine for sampling, not for differential gates). Single source of the
    weight math for BOTH q_lang_sampling_weights and
    temperature_resample."""
    per_lang = docs.groupBy(lang_col).agg(F.count("*").alias("n_docs"))
    totals = per_lang.agg(F.sum("n_docs").alias("__nt"))
    p = F.col("n_docs").cast("double") / F.col("__nt")
    w_raw = F.sqrt(p) if alpha == 0.5 else F.pow(p, F.lit(alpha))
    enriched = per_lang.crossJoin(F.broadcast(totals)).withColumn(
        "__wraw", w_raw
    )
    z = enriched.agg(F.sum("__wraw").alias("__z"))
    return (
        enriched.crossJoin(F.broadcast(z))
        .select(
            lang_col,
            F.col("n_docs").cast("long").alias("n_docs"),
            p.alias("p"),
            (F.col("__wraw") / F.col("__z")).alias("w"),
            ((F.col("__wraw") / F.col("__z")) / p).alias("u"),
        )
    )


def temperature_resample(
    docs: DataFrame,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    seed: str = "resample",
) -> DataFrame:
    """Temperature-resampled corpus materialization: per-language copy
    counts realizing the p^alpha sampling distribution (XLM line,
    alpha=0.5 default) at the ORIGINAL corpus size.

    Per-doc expected copies = w_l/p_l (the language upsample factor u):
    every doc gets floor(u) copies plus one more iff its stable hash
    fraction < frac(u) — deterministic stochastic rounding. Draws are
    per-doc independent, so the realized count matches the target in
    expectation with O(√n_l) deviation (the no-shuffle trade: hitting it
    exactly would need a per-language rank, i.e. a sort over every
    language partition); the assignment is bit-reproducible across
    retries and partitionings, the same reason every sampler here hashes
    content instead of rand(). Head languages get u < 1
    (hash-thresholded downsample), tail languages u > 1 (integer
    repetition + remainder draw).

    One full-data pass + two broadcast-sized aggregates; returns
    (id, lang, n_copies) with n_copies >= 0. Materialize the physical
    copies with `explode(array_repeat(lit(1), n_copies.cast("int")))` —
    an n_copies = 0 row yields an empty array and drops out (NOT
    sequence(1, n): Spark sequences run descending when end < start, so
    sequence(1, 0) would emit two rows)."""
    weights = temperature_weights(docs, lang_col, alpha).select(
        lang_col, F.col("u").alias("__u")
    )
    u = F.col("__u")
    frac = u - F.floor(u)
    # uniform [0,1) fraction from the stable 8-hex-char content hash
    hfrac = (
        F.conv(hash_hex(F.col(id_col), seed), 16, 10).cast("double")
        / F.lit(float(HEX_SPACE))
    )
    return (
        docs.select(id_col, lang_col)
        .join(F.broadcast(weights), lang_col)
        .select(
            id_col,
            lang_col,
            (
                F.floor(u).cast("long")
                + F.when(hfrac < frac, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_copies"),
        )
    )


def dsir_bucket_llr(
    docs: DataFrame,
    target: Column,
    dim: int = 1024,
    text_col: str = "text",
    hash_expr=None,
) -> DataFrame:
    """Hashed-feature log-likelihood ratios for DSIR-style importance
    resampling (Xie et al., "Data Selection for Language Models via
    Importance Resampling", NeurIPS 2023): score how target-like a
    document is using two hashed-unigram bag-of-words models — one fit
    on the `target` subset, one on the full corpus — without training
    anything.

    Returns the (bucket, llr_micro) model table: for each of `dim` hash
    buckets, the add-one-smoothed log ratio
        ln( P_target(bucket) / P_background(bucket) )
    quantized to integer MICRO-NATS (floor(x*1e6 + 0.5)). Per-document
    weights then sum these integers (see dsir_weights), so the corpus-
    sized aggregation is exact integer math — partial-aggregation order
    cannot perturb it, and a DuckDB oracle reproduces it bit-for-bit.
    The only float op is one ln per bucket (dim of them, not N).

    Scale shape: ONE shuffle on the bucket key builds both count
    vectors (conditional aggregation, map-side combined); the model
    table is `dim` rows and broadcasts everywhere it's consumed.
    """
    from ..functions.text import split_words

    h = hash_expr if hash_expr is not None else (
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    from ..plans.shape import ensure_min_parallelism

    # fan the one-split scan before the token explode + per-token md5
    # (no-op at scale — plans/shape.py)
    toks = ensure_min_parallelism(
        docs.select(target.alias("__is_tgt"), F.col(text_col))
    ).select(
        "__is_tgt",
        F.explode(
            F.filter(split_words(text_col), lambda t: t != "")
        ).alias("__tok"),
    )
    counts = toks.groupBy(
        F.pmod(h(F.col("__tok")), F.lit(dim)).alias("bucket")
    ).agg(
        F.count("*").alias("bg_c"),
        F.sum(F.when(F.col("__is_tgt"), 1).otherwise(0)).alias("tgt_c"),
    )
    totals = counts.agg(
        F.sum("bg_c").alias("bg_tot"), F.sum("tgt_c").alias("tgt_tot")
    )
    # add-one smoothing over the dim-bucket vocabulary; the ratio is a
    # product/quotient of exact integer-valued doubles (< 2^52), so the
    # double result is correctly rounded and engine-independent; ln of
    # it may differ in the last ulp across libm builds, which the 1e-6
    # quantization grid absorbs except on astronomically thin boundaries
    ratio = (
        (F.col("tgt_c") + 1.0)
        * (F.col("bg_tot") + float(dim))
        / ((F.col("bg_c") + 1.0) * (F.col("tgt_tot") + float(dim)))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(F.log(ratio) * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("llr_micro"),
        )
    )


def dsir_weights(
    docs: DataFrame,
    model: DataFrame,
    dim: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_expr=None,
) -> DataFrame:
    """Per-document DSIR importance weights against a dsir_bucket_llr
    model table: explode tokens, broadcast-join the dim-row model on the
    hashed bucket, sum the integer micro-nat scores per document. One
    shuffle (the per-doc sum, map-side combined); weight_micro is an
    exact BIGINT, weight its 1e-6-scaled double view. Documents whose
    tokens look like the target subset score positive; resample by
    softmax/top-k downstream (temperature_resample composes here)."""
    from ..functions.text import split_words
    from ..plans.shape import ensure_min_parallelism

    h = hash_expr if hash_expr is not None else (
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )
    # fan the one-split scan before the token explode + per-token md5
    # (no-op at scale — plans/shape.py)
    toks = ensure_min_parallelism(
        docs.select(F.col(id_col), F.col(text_col))
    ).select(
        F.col(id_col),
        F.explode(
            F.filter(split_words(text_col), lambda t: t != "")
        ).alias("__tok"),
    )
    return (
        toks.select(
            id_col, F.pmod(h(F.col("__tok")), F.lit(dim)).alias("bucket")
        )
        .join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("llr_micro").alias("weight_micro"),
        )
        .select(
            id_col,
            "n_toks",
            "weight_micro",
            (F.col("weight_micro") / 1e6).alias("weight"),
        )
    )


def weighted_bottomk(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wpps",
) -> DataFrame:
    """Weighted probability-proportional-to-size ORDER sampling
    (Ohlsson's sequential Poisson / Rosén's priority sampling, public
    survey-sampling technique): each row gets priority u/w with u
    uniform and w its positive weight; the k smallest priorities per
    group form a without-replacement PPS sample — heavier rows sort
    earlier and are proportionally more likely to be kept.

    Determinism engineering, same contract as bottomk/kmv: u is the
    md5-derived 60-bit integer of (seed, id), and the sort key is ONE
    IEEE double division of two exactly-represented integers — both
    the int→double rounding and the division are correctly rounded, so
    ANY engine computes the bit-identical key and the sample is a pure
    function of (ids, weights, seed): stable across runs, retries,
    partition layouts, and engines, which rand()-weighted sampling is
    not. Ties (identical doubles) break by id.

    Shape: one narrow map + one per-group window keeping k rows — the
    shuffle carries (group, id, weight, key) only, never payloads;
    mergeable like bottom-k (per-shard bottom-k union-merges to the
    global sample). Non-positive/NULL weights are EXCLUDED (a zero
    weight must never be sampled; u/0 would be +inf anyway, but the
    explicit filter keeps the contract visible)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{seed}:"), F.col(id_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy(*group_cols).orderBy(
        F.asc("priority"), F.asc(id_col)
    )
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn(
            "priority",
            h.cast("double") / F.col(weight_col).cast("double"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
