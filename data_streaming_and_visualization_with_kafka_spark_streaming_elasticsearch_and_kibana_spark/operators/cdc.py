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
    wins, deterministic via the order_cols tiebreak). Thin wrapper over
    relational.latest_per_key so the keyed last-write-wins logic has
    exactly one implementation."""
    from .relational import latest_per_key

    if len(order_cols) > 2:
        raise ValueError("latest_changes supports at most 2 order columns")
    ts, *rest = order_cols
    return latest_per_key(log, key_cols, ts, tiebreak=rest[0] if rest else None)


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
    - any other final op — including a NULL op — upserts: non-key
      columns common to both sides are taken from the change, columns
      only in base are kept, columns only in the change appear (null
      for untouched base rows);
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
        # presence marker distinct from __op: the op value itself may
        # legitimately be NULL (treated as an upsert), so change-row
        # detection must not ride on __op's nullability
        F.lit(1).alias("__present"),
        *[F.col(v).alias(f"__c_{v}") for v in c_vals],
    )
    j = b.join(c, key_cols, "full_outer")
    # deleted keys drop out; unmatched base rows and NULL-op upserts survive
    j = j.filter(
        F.col("__present").isNull()
        | F.col("__op").isNull()
        | (F.col("__op") != delete_op)
    )
    base_vals = [x for x in base.columns if x not in key_cols]
    out_cols = [F.col(k) for k in key_cols]
    for v in base_vals:
        if v in c_vals:  # the change is authoritative (even a NULL)
            out_cols.append(
                F.when(F.col("__present").isNotNull(), F.col(f"__c_{v}"))
                .otherwise(F.col(f"__b_{v}"))
                .alias(v)
            )
        else:
            out_cols.append(F.col(f"__b_{v}").alias(v))
    for v in c_vals:
        if v not in base_vals:  # change-only column
            out_cols.append(F.col(f"__c_{v}").alias(v))
    return j.select(*out_cols)
