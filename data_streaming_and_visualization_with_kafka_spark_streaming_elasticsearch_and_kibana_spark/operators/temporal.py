"""Temporal joins — the as-of join PySpark lacks natively (SURVEY §2.3:
sensor readings rarely share exact timestamps; the reference sidesteps
this only because KETI sensors share a clock).

Scale design: the classic implementations are an inequality
(theta) join — O(n·m) per key and un-broadcastable — or a per-row range
probe. Here the two sides are UNIONED with a side tag and resolved by a
single window pass per key: one shuffle on the join keys, linear scan
per partition, and the matched right row travels as ONE struct column so
all its fields are guaranteed to come from the same row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
    rsuffix: str = "_r",
) -> DataFrame:
    """For each left row: the latest right row with right.ts <= left.ts
    within the same key group (backward as-of join, equal ts matches).

    `right` should be unique per (keys, ts) — pre-dedup with
    relational.latest_per_key otherwise. Right columns are appended with
    `rsuffix`; unmatched left rows get NULLs (left-join semantics).
    """
    rstruct = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    r = right.select(*keys, ts_col, rstruct).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    # one union, one shuffle: right rows sort BEFORE left rows at equal ts
    # so an exact-timestamp match is visible to the left row
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(ts_col), F.asc("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1).drop("__side", "__r")
    for c in right_cols:
        out = out.withColumn(f"{c}{rsuffix}", F.col(f"__match.{c}"))
    return out.drop("__match")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    right_cols: list[str],
    rsuffix: str = "_r",
) -> DataFrame:
    """FORWARD as-of join: for each left row, the EARLIEST right row
    with right.ts >= left.ts within the same key group (equal ts
    matches) — "what happened next", the mirror of asof_join's "what
    was current". Same scale shape: one union, one shuffle, one window
    pass per key; the frame just looks ahead instead of behind (first
    non-null over [current, unbounded following], right rows sorting
    AFTER left rows at equal ts so exact matches stay visible)."""
    rstruct = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    r = right.select(*keys, ts_col, rstruct).withColumn("__side", F.lit(2))
    l = left.withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.asc(ts_col), F.asc("__side"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    u = u.withColumn("__match", F.first("__r", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1).drop("__side", "__r")
    for c in right_cols:
        out = out.withColumn(f"{c}{rsuffix}", F.col(f"__match.{c}"))
    return out.drop("__match")


def scd2_ranges(
    df,
    key_cols: list[str],
    ts_col: str = "ts",
    order_tiebreak: list[str] | None = None,
):
    """Slowly-changing-dimension (type 2) history build: per key, turn a
    change log into validity intervals [valid_from, valid_to), open-ended
    (null valid_to) for the current version.

    One window over (key, ts) — a single shuffle on the key, same cost
    profile as any per-key window at scale; the interval assembly is a
    LEAD, no self-join (the naive range build joins the log to itself).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    order = [F.col(ts_col)] + [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return df.withColumn("valid_from", F.col(ts_col)).withColumn(
        "valid_to", F.lead(ts_col).over(w)
    )


def runs(
    df: DataFrame,
    key_cols: list[str],
    state_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Gaps-and-islands: collapse each key's ordered change log into
    maximal runs of an unchanged state value.

    Island id = row_number over (key) minus row_number over
    (key, state): constant within a streak, distinct across streaks —
    two window passes over the SAME (key, order) shuffle, so Spark
    reuses one exchange; no self-join, no iteration. Returns one row
    per run: keys, state, run_len, run start/end order columns.
    """
    order = [F.asc(c) for c in order_cols]
    w_all = Window.partitionBy(*key_cols).orderBy(*order)
    w_state = Window.partitionBy(*key_cols, state_col).orderBy(*order)
    grp = (F.row_number().over(w_all) - F.row_number().over(w_state)).alias(
        "__grp"
    )
    first_ord = order_cols[0]
    return (
        df.select(*key_cols, state_col, *order_cols, grp)
        .groupBy(*key_cols, state_col, "__grp")
        .agg(
            F.count("*").alias("run_len"),
            F.min(first_ord).alias("run_start"),
            F.max(first_ord).alias("run_end"),
        )
        .drop("__grp")
    )


def locf(
    df: DataFrame,
    value_col,
    key_cols: list[str],
    order_cols: list[str],
    out_col: str = "locf",
) -> DataFrame:
    """Last-observation-carried-forward gap fill: per key, replace a
    (possibly null) observation column with the most recent non-null
    value at or before each row.

    One window (unbounded-preceding last with ignorenulls) over one
    shuffle on the key — the streaming-friendly twin is
    latest_value_view; this is the batch repair pass run before
    training-data export.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.last(v, ignorenulls=True).over(w))


def date_spine(
    df: DataFrame,
    ts_col: str,
    dims: DataFrame,
    counts: DataFrame,
    day_col: str = "day",
) -> DataFrame:
    """Dense daily spine zero-fill: cross the corpus's [min_day, max_day]
    range with a (small) dimension table and left-join sparse per-day
    aggregates, so missing days surface as explicit zero rows (what a
    dashboard's date_histogram needs — ES emits empty buckets; a naive
    groupBy silently drops them).

    The spine is built from a single-row global min/max aggregate
    (tiny, broadcast by AQE) exploded via sequence() — no driver
    round-trip, no collect; `dims` must be broadcast-small.
    """
    bounds = df.agg(
        F.min(F.to_date(ts_col)).alias("lo"), F.max(F.to_date(ts_col)).alias("hi")
    )
    days = bounds.select(
        F.explode(
            F.sequence(F.col("lo"), F.col("hi"), F.expr("interval 1 day"))
        ).alias(day_col)
    )
    return days.crossJoin(F.broadcast(dims)).join(
        counts, [day_col, *dims.columns], "left"
    )


def interpolate_linear(
    obs: DataFrame,
    spine: DataFrame,
    keys: list[str],
    ts_col: str = "t",
    value_col: str = "value",
    out_col: str = "value_interp",
) -> DataFrame:
    """Linear interpolation of irregular observations onto a target
    spine — the resampling op an irregular sensor feed (the reference's
    KETI data) needs before fusion/charting, and the step up from LOCF
    (`locf` holds the last value flat; this weights the two bracketing
    observations by time distance).

    obs:   keys + ts_col (numeric, e.g. epoch seconds) + value_col,
           UNIQUE per (keys, ts) — pre-aggregate duplicates first, or
           the bracketing values are tie-order-nondeterministic.
    spine: keys + ts_col target points.

    Shape: one union + two window passes per key (forward pass finds
    the observation at-or-before each spine point, backward pass the
    one strictly after) — no range join, no per-point probe; state is
    one row per observation ∪ spine point, partitioned by key. Spine
    points outside the observed range yield NULL (interpolation, not
    extrapolation); an exact-timestamp hit returns that observation
    verbatim."""
    u = obs.select(
        *keys,
        F.col(ts_col).cast("double").alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(1).alias("__is_obs"),
    ).unionByName(
        spine.select(
            *keys,
            F.col(ts_col).cast("double").alias("__t"),
            F.lit(None).cast("double").alias("__v"),
            F.lit(0).alias("__is_obs"),
        )
    )
    # at an equal timestamp the observation sorts BEFORE the spine
    # point, so the forward pass treats it as "at-or-before" and the
    # backward pass (current row onward) cannot see it as "after"
    order = [F.asc("__t"), F.desc("__is_obs")]
    fwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("__is_obs") == 1, F.col("__t"))
    w = (
        u.withColumn("__v0", F.last("__v", ignorenulls=True).over(fwd))
        .withColumn("__t0", F.last(obs_t, ignorenulls=True).over(fwd))
        .withColumn("__v1", F.first("__v", ignorenulls=True).over(bwd))
        .withColumn("__t1", F.first(obs_t, ignorenulls=True).over(bwd))
        .filter(F.col("__is_obs") == 0)
    )
    frac = (F.col("__t") - F.col("__t0")) / (F.col("__t1") - F.col("__t0"))
    interp = (
        F.when(F.col("__t0") == F.col("__t"), F.col("__v0"))
        .when(
            F.col("__t0").isNotNull() & F.col("__t1").isNotNull(),
            F.col("__v0") + (F.col("__v1") - F.col("__v0")) * frac,
        )
    )
    return w.select(
        *keys,
        F.col("__t").alias(ts_col),
        interp.alias(out_col),
    )
