"""Plan-inspection helpers — the engine's "did Catalyst do what we
designed for?" feedback loop (pushdown, pruning, broadcast, codegen)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def assert_pushed_filters(df: DataFrame) -> bool:
    """True if the physical plan shows parquet PushedFilters."""
    return "PushedFilters: [" in formatted_plan(df)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen stages in the physical plan
    (formatted mode annotates operators with `[codegen id : N]`)."""
    import re

    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))
