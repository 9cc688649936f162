"""Dump .explain("formatted") for named queries to plans/<round>/
(round dir from $SPARK_GRAFT_PLAN_DIR, default r16).

Usage:
    python tools/dump_plans.py before query [query ...]
    python tools/dump_plans.py after  query [query ...]

Writes plans/<round>/<query>_<tag>.txt at sf0.1 (the bench scale, so
the plan matches what the bench times). Queries whose construction runs
eager driver work (streaming, BPE training collects) still dump — the
explain covers the final lazy frame; the eager prefix is noted by the
caller in the round's OPTIMIZATION ledger.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark.plans.explain import (
    formatted_plan,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_DIR", "r16"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, SF)
        txt = formatted_plan(df)
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print("wrote", path)


if __name__ == "__main__":
    main()
