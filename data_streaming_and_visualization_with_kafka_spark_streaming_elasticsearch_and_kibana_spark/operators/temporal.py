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
