"""Ad-hoc subset timing with the bench.py protocol (warmup at sf0.001,
median-of-3 count() at sf0.1) — for isolating one query's movement
without paying a full 164-query run. Usage:

    python tools/microbench.py <query> [query ...]

Prints one `name median [samples]` line per query. Never writes any
BENCH artifact; tooling only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from data_streaming_and_visualization_with_kafka_spark_streaming_elasticsearch_and_kibana_spark import (
    get_spark,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warmup at the sibling sf0.001 of whatever sf_dir points at (r15
    # advice: the hardcoded /root/testdata path ran every warmup cold
    # on any other host layout)
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    names = sys.argv[1:]
    spark = get_spark(app_name="microbench")
    qs = entrymod.queries()
    for name in names:
        try:
            qs[name](spark, warm_dir).count()
        except Exception as exc:  # surface, don't die: timing tool
            print(f"{name} WARMUP-ERR {exc}")
    for name in names:
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
        med = sorted(samples)[1]
        print(
            f"{name} {med:.3f} [{', '.join(f'{s:.3f}' for s in samples)}]"
        )


if __name__ == "__main__":
    main()
