"""Generic relational operators — the Kibana-analytics surface (SURVEY §2.4
A3, §2.5, §2.6) plus the batch projections/set-ops of §2.2/§2.7.

Everything is a thin, composable builder over DataFrame ops so Catalyst
sees the whole plan (pushdown/pruning/broadcast come free). No collect(),
no driver-side loops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ------------------------------------------------------- projections / filters
def project_exclude(df: DataFrame, excluded: list[str]) -> DataFrame:
    """Negative projection (P1, dataframe_to_kafka.py:64-66)."""
    return df.drop(*excluded)


def drop_null_rows(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Null-row filter (P2, dataframe_to_kafka.py:61,76) — na.drop('any')."""
    return df.na.drop("any", subset=subset)


# ------------------------------------------------------------------- set ops
def union_all(dfs: list[DataFrame]) -> DataFrame:
    """U1 (pd.concat, data_collector.py:46) — by-name union."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def repeat_rows(df: DataFrame, n: int) -> DataFrame:
    """U2 (replay ×N, dataframe_to_kafka.py:91) without driver loops:
    explode a constant array — one narrow map stage, no union chain."""
    return (
        df.withColumn("__r", F.explode(F.array_repeat(F.lit(1), n)))
        .drop("__r")
    )


# ---------------------------------------------------------------- aggregation
def date_histogram(
    df: DataFrame,
    ts_col: str,
    interval: str = "day",
    keys: tuple[str, ...] = (),
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Kibana date-histogram (A3): truncate + group. `interval` is any
    date_trunc unit (minute/hour/day/week/month)."""
    bucket = F.date_trunc(interval, F.col(ts_col)).alias("bucket")
    aggs = aggs or [F.count("*").alias("doc_count")]
    return df.groupBy(bucket, *keys).agg(*aggs)


def terms_agg(
    df: DataFrame, key: str, aggs: list[Column] | None = None, k: int | None = None
) -> DataFrame:
    """Kibana terms aggregation: group by key, optional top-k by count.
    Top-k compiles to TakeOrderedAndProject — no full sort at scale."""
    aggs = aggs or [F.count("*").alias("doc_count")]
    out = df.groupBy(key).agg(*aggs)
    if k:
        out = out.orderBy(F.desc("doc_count"), F.asc(key)).limit(k)
    return out


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """Hierarchical subtotals (Kibana split-chart equivalent)."""
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


# ------------------------------------------------------------------- windows
def topk_per_group(
    df: DataFrame, part_keys: list[str], order: list[Column], k: int
) -> DataFrame:
    """Top-k rows per group via row_number window. `order` must be a
    deterministic total order (include a unique tiebreaker column)."""
    w = Window.partitionBy(*part_keys).orderBy(*order)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def latest_per_key(
    df: DataFrame, keys: list[str], ts_col: str, tiebreak: str | None = None
) -> DataFrame:
    """Keyed last-write-wins view — the batch twin of the reference's
    ES doc-id upsert (S8/T5, spark_streaming_kafka.py:41: es.mapping.id=room
    keeps only the latest doc per room).
    """
    order = [F.desc(ts_col)] + ([F.desc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def lag_delta(
    df: DataFrame, keys: list[str], ts_col: str, value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key consecutive delta (sensor-rate-of-change analytics)."""
    order = [F.asc(ts_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(value_col).over(w)
    return df.withColumn("prev_value", prev).withColumn(
        "delta", F.col(value_col) - prev
    )


# --------------------------------------------------------------------- joins
def multiway_join(
    base: DataFrame, joins: list[tuple[DataFrame, list[str] | Column, str]]
) -> DataFrame:
    """Chained join builder (J1 generalized). Each entry: (df, on, how).
    Catalyst/AQE reorders and picks broadcast vs. sort-merge; callers
    should still `F.broadcast()` dimension tables explicitly for
    plan stability at scale."""
    out = base
    for other, on, how in joins:
        out = out.join(other, on, how)
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-busting equi-join: scatter the (large, skewed) left side
    across `n_salts` random salt buckets and replicate the right side
    once per salt, so a hot key's rows spread over n_salts tasks instead
    of one straggler. Semantics identical to `left.join(right, on, how)`
    for inner/left joins; right-side size must tolerate ×n_salts
    replication. Prefer AQE's automatic skew split first — this is the
    explicit tool for when a single key dominates a 100 TB shuffle."""
    l = left.withColumn("__salt", F.floor(F.rand(seed) * n_salts).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, on + ["__salt"], how).drop("__salt")


def band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    step: float = 1.0,
) -> DataFrame:
    """Range (band) join — ``facts.value BETWEEN bands.lo AND bands.hi``
    (lo inclusive, hi exclusive) — rewritten as a broadcast *equi*-join.

    Spark has no native range-join operator: a raw non-equi predicate
    compiles to BroadcastNestedLoopJoin, O(facts × bands) comparisons —
    fatal at 100 TB. Instead, quantize the value space into fixed-width
    buckets of ``step``: explode each band into the bucket ids it covers,
    equi-join the fact's bucket against that (broadcast) exploded table,
    then re-apply the exact range predicate as a residual filter. Each
    fact row is compared against only the bands overlapping its bucket —
    hash lookup, whole-stage codegen, no shuffle on the fact side.

    ``step`` tunes replication: bands of width w explode into ~w/step
    rows each; pick step ≈ median band width. Requires finite lo/hi.
    """
    v = F.col(value_col)
    fact_b = facts.withColumn("__bucket", F.floor(v / step).cast("long"))
    band_b = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / step).cast("long"),
                F.floor((F.col(hi_col) - 1e-9) / step).cast("long"),
            )
        ),
    )
    return (
        fact_b.join(F.broadcast(band_b), "__bucket")
        .filter((v >= F.col(lo_col)) & (v < F.col(hi_col)))
        .drop("__bucket")
    )


# ------------------------------------------------------------------ sampling
def shuffled(df: DataFrame, seed: int = 42) -> DataFrame:
    """O1 (sample(frac=1), dataframe_to_kafka.py:58) — deterministic full
    shuffle by seeded rand. This is a GLOBAL sort: only use when a total
    random order matters; `shuffled_within_partitions` is the scale path."""
    return df.orderBy(F.rand(seed))


def shuffled_within_partitions(
    df: DataFrame, seed: int = 42, num_partitions: int | None = None
) -> DataFrame:
    """Scalable randomization: scatter rows across partitions by a seeded
    rand key (one hash shuffle, no global sort) and randomize order
    inside each partition with a local sort. Sufficient for replay /
    training-shard randomization, where inter-shard order is irrelevant."""
    key = F.rand(seed)
    parts = [num_partitions] if num_partitions else []
    return df.repartition(*parts, key).sortWithinPartitions(F.rand(seed + 1))


def zorder2_key(a: Column, b: Column) -> Column:
    """Morton (z-order) key interleaving the low 16 bits of two
    non-negative dimensions — the space-filling-curve clustering key
    for multi-dimensional data layout.

    Why it matters at 100 TB: `repartitionByRange(zorder2_key(x, y))`
    + sorted parquet write co-locates rows that are close in BOTH
    dimensions, so min/max row-group statistics prune scans for 2-D
    predicates — a plain sort on x gives pruning on x only. Pure
    integer shift/mask arithmetic (the classic magic-mask bit spread),
    JVM-codegen'd, engine-exact.
    """

    def lmask(m: int) -> Column:
        return F.lit(m).cast("long")

    def spread(x: Column) -> Column:
        # Column.&/| are LOGICAL operators in PySpark; bitwise ops are
        # the bitwiseAND/bitwiseOR methods.
        x = x.cast("long").bitwiseAND(lmask(0xFFFF))
        x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(lmask(0x00FF00FF))
        x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(lmask(0x0F0F0F0F))
        x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(lmask(0x33333333))
        x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(lmask(0x55555555))
        return x

    return spread(a).bitwiseOR(F.shiftleft(spread(b), 1))
