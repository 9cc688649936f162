"""Data-quality expectations — single-pass constraint checking.

The Deequ/Great-Expectations idea reduced to its Spark-native core: a
set of named constraints over a table is ONE aggregation pass (every
violation counter is a conditional SUM computed map-side), unpivoted to
a long-format report `(check, n_violations, passed)`. At 100 TB this is
the shape that matters — k constraints cost one scan, not k scans, and
the report is small enough to gate a pipeline step on `.collect()`.

Uniqueness is the one constraint that can't be a conditional sum; it is
expressed as `COUNT(*) - COUNT(DISTINCT key)`, which Spark plans into
the same aggregate (two-phase with a distinct expand — still one scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation(name: str, predicate: Column) -> tuple[str, Column]:
    """A named constraint; `predicate` is TRUE where the row VIOLATES it
    (null-safe: NULL predicate counts as a violation — unknown is not
    a pass)."""
    bad = F.when(predicate.isNull() | predicate, 1).otherwise(0)
    return (name, F.sum(bad).cast("long"))


def tag_failures(
    df: DataFrame,
    violations: list[tuple[str, Column]],
    out_col: str = "failed_checks",
) -> DataFrame:
    """Row-level twin of `violation`: annotate every row with the array
    of check names it violates, same null-safe semantics (a NULL
    predicate IS a violation — unknown is not a pass). Pure Column
    expressions, so the tagging is map-side and whole-stage-codegen'd;
    this is the exact production path `streaming.pipeline.
    quality_gate_sink` routes micro-batches through, exposed for batch
    use and for the oracle twin (`q_quality_gate_routing`)."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(pred.isNull() | pred, F.lit(name))
                for name, pred in violations
            ]
        )
    )
    return df.withColumn(out_col, failed)


def unique_violation(name: str, *cols: str) -> tuple[str, Column]:
    """Rows beyond the first per distinct key combination."""
    return (
        name,
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("long"),
    )


def expectations_report(
    df: DataFrame, checks: list[tuple[str, Column]]
) -> DataFrame:
    """(check, n_violations, passed) — one row per constraint, one scan
    total. Column order in the stack is the caller's check order."""
    aggs = [expr.alias(f"__c{i}") for i, (_, expr) in enumerate(checks)]
    wide = df.agg(*aggs)
    # check names are caller-supplied strings interpolated into a SQL
    # expression — double any single quotes so a name like "o'clock"
    # can't break (or inject into) the stack() expr
    stack_args = ", ".join(
        "'{}', __c{}".format(name.replace("'", "''"), i)
        for i, (name, _) in enumerate(checks)
    )
    return wide.select(
        F.expr(f"stack({len(checks)}, {stack_args}) AS (check, n_violations)")
    ).select(
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
