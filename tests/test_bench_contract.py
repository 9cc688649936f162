"""Bench harness contract guards.

The round driver captures only the LAST 2,000 characters of bench.py's
stdout and parses them as JSON — a payload that outgrows the buffer
silently turns BENCH_r{N}.json's `parsed` null (rounds 1-6 all shipped
that way). Growing HEADLINE must never re-break it.
"""

from __future__ import annotations

import json

import bench
import __spark_entry__ as entrymod


def test_headline_names_resolve_and_are_unique():
    qs = entrymod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"HEADLINE entries not in queries(): {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_bench_line_fits_driver_capture_buffer():
    # worst-case widths: every median two digits + 2 dp, wire block at
    # its widest observed shapes
    times = {name: 99.99 for name in bench.HEADLINE}
    short = {f"q{i + 1}": t for i, (_, t) in enumerate(times.items())}
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": short,
        "sf": 0.1,
        "key": "qK=HEADLINE[K-1]",
        "wire_replay_rows": 34890,
        "wire_replay_sec": 99.999,
        "wire_replay_rows_per_sec": 99999.9,
        "baseline_rows_per_sec": 2.0,
        "wire_vs_baseline": 49999.9,
    }
    # same compact serialization bench.py emits
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) < 1950, (
        f"bench line would be {len(line)} chars — over the driver's "
        "2,000-char capture buffer; shrink the payload before growing "
        "HEADLINE"
    )
