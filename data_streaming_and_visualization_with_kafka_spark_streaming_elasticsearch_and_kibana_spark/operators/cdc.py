"""Change-data-capture apply: MERGE a keyed change log onto a base
snapshot (SCD type-1 upsert + delete) without a MERGE INTO statement —
Spark's DataFrame API lacks one outside table formats, but the
semantics are a composition: last-write-wins on the log, then a single
full-outer resolve against the base.

Scale design: one shuffle to collapse the log (latest_per_key window),
one shuffle for the outer join on the key — both on the same key, so
AQE can reuse the exchange. No driver-side diffing, no collect;
deletes are a filter, not a second pass. The base is typically the
large side; the collapsed log is often broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_changes(
    log: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Collapse a change log to its final state per key (last write
    wins, deterministic via the full order_cols tiebreak)."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a change log onto a base snapshot:

    - the latest change per key wins (order_cols descending);
    - a final `delete_op` removes the key (even if it exists in base);
    - any other final op upserts: non-key columns common to both sides
      are taken from the change, columns only in base are kept,
      columns only in the change appear (null for untouched base rows);
    - base rows with no change pass through unchanged.

    Returns the new snapshot with schema = base ∪ change value columns
    (minus op_col).
    """
    last = latest_changes(changes, key_cols, order_cols)
    b = base.select(
        *key_cols,
        *[
            F.col(c).alias(f"__b_{c}")
            for c in base.columns
            if c not in key_cols
        ],
    )
    c_vals = [c for c in last.columns if c not in key_cols and c != op_col]
    c = last.select(
        *key_cols,
        F.col(op_col).alias("__op"),
        *[F.col(v).alias(f"__c_{v}") for v in c_vals],
    )
    j = b.join(c, key_cols, "full_outer")
    # deleted keys drop out; unmatched base rows (__op null) survive
    j = j.filter(F.col("__op").isNull() | (F.col("__op") != delete_op))
    base_vals = [x for x in base.columns if x not in key_cols]
    out_cols = [F.col(k) for k in key_cols]
    for v in base_vals:
        if v in c_vals:  # the change is authoritative (even a NULL)
            out_cols.append(
                F.when(F.col("__op").isNotNull(), F.col(f"__c_{v}"))
                .otherwise(F.col(f"__b_{v}"))
                .alias(v)
            )
        else:
            out_cols.append(F.col(f"__b_{v}").alias(v))
    for v in c_vals:
        if v not in base_vals:  # change-only column
            out_cols.append(F.col(f"__c_{v}").alias(v))
    return j.select(*out_cols)
