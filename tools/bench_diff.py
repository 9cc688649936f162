"""Name-matched bench-ledger diff — the round-over-round adjudicator
(r10 verdict task 7 / r11 verdict task 6).

Compares a fresh bench run (a BENCH_FULL-shaped JSON, or the committed
working-tree BENCH_FULL.json) against the LEDGER OF RECORD — the
BENCH_FULL.json committed at a prior round's final tree (via
`git show <ref>:BENCH_FULL.json`). Per-query deltas inside the measured
±20% same-machine noise band (bench.py docstring: ±5% driver-vs-builder
on identical code, with individual microbench queries swinging wider —
the r9 dedup_keep_best flag and the r11 mann_whitney/gini blips were
both this class) are reported but not flagged; moves beyond the band
are listed as REGRESSED/IMPROVED so a round's verdict can adjudicate
them from the artifact instead of re-running A/B worktrees by hand.

Usage:
    python tools/bench_diff.py                  # HEAD ledger vs working tree
    python tools/bench_diff.py --ref <commit>   # older ledger as baseline
    python tools/bench_diff.py --new run.json   # a fresh run as candidate
    python tools/bench_diff.py --markdown       # PLANS.md-pasteable table

Exit code 0 always — the tool adjudicates, it does not gate (a noisy
machine must not fail CI; the differential correctness gates do that).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: same-machine noise band for individual query timings (see module
#: docstring); total-time moves are usually much tighter but totals are
#: compared with the same band for consistency
NOISE_BAND = 0.20
#: sub-100ms queries bounce by scheduler quanta — require an absolute
#: floor too, so a 0.04s→0.06s "50% regression" is not flagged
ABS_FLOOR_SEC = 0.15


def _ledger_at(ref: str) -> dict:
    blob = subprocess.run(
        ["git", "show", f"{ref}:BENCH_FULL.json"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(blob)


def diff(base: dict, new: dict) -> dict:
    """Name-matched comparison; returns the full adjudication dict."""
    bq, nq = base.get("queries", {}), new.get("queries", {})
    shared = sorted(set(bq) & set(nq))
    rows = []
    for name in shared:
        b, n = float(bq[name]), float(nq[name])
        delta = n - b
        rel = delta / b if b > 0 else float("inf")
        flag = ""
        if abs(delta) >= ABS_FLOOR_SEC and abs(rel) > NOISE_BAND:
            flag = "REGRESSED" if delta > 0 else "IMPROVED"
        rows.append(
            {"query": name, "base": b, "new": n,
             "delta": round(delta, 3), "rel_pct": round(100 * rel, 1),
             "flag": flag}
        )
    rows.sort(key=lambda r: -abs(r["delta"]))
    bt = sum(float(bq[n]) for n in shared)
    nt = sum(float(nq[n]) for n in shared)
    return {
        "n_shared": len(shared),
        "only_in_base": sorted(set(bq) - set(nq)),
        "only_in_new": sorted(set(nq) - set(bq)),
        "base_total_sec": round(bt, 2),
        "new_total_sec": round(nt, 2),
        "total_rel_pct": round(100 * (nt - bt) / bt, 2) if bt else None,
        "noise_band_pct": 100 * NOISE_BAND,
        "abs_floor_sec": ABS_FLOOR_SEC,
        "regressed": [r for r in rows if r["flag"] == "REGRESSED"],
        "improved": [r for r in rows if r["flag"] == "IMPROVED"],
        "rows": rows,
    }


def to_markdown(d: dict, top: int = 10) -> str:
    lines = [
        f"| query | base s | new s | Δs | Δ% | verdict |",
        "|---|---|---|---|---|---|",
    ]
    for r in d["rows"][:top]:
        lines.append(
            f"| {r['query']} | {r['base']:.2f} | {r['new']:.2f} | "
            f"{r['delta']:+.2f} | {r['rel_pct']:+.1f}% | "
            f"{r['flag'] or 'noise-class'} |"
        )
    lines.append(
        f"\nname-matched total: {d['base_total_sec']}s → "
        f"{d['new_total_sec']}s ({d['total_rel_pct']:+.2f}%); "
        f"{len(d['regressed'])} regressed / {len(d['improved'])} improved "
        f"beyond ±{d['noise_band_pct']:.0f}% ∧ ≥{d['abs_floor_sec']}s. "
        "Flagged entries are CANDIDATES: sub-2s microbench queries have "
        "measured best-of-3 spreads wider than the band (r11: "
        "mann_whitney 1.26-1.72s on unchanged code) — adjudicate a flag "
        "by median-of-3 re-run, or by checking whether the query's code "
        "path changed at all (git log -p on the operator)."
    )
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref", default="HEAD", help="git ref of the baseline ledger")
    ap.add_argument("--new", default=None,
                    help="candidate JSON path (default: working-tree BENCH_FULL.json)")
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()

    base = _ledger_at(args.ref)
    new_path = args.new or os.path.join(REPO, "BENCH_FULL.json")
    with open(new_path) as f:
        new = json.load(f)
    d = diff(base, new)
    if args.markdown:
        print(to_markdown(d, args.top))
    else:
        out = dict(d)
        out["rows"] = out["rows"][: args.top]
        json.dump(out, sys.stdout, indent=1)
        print()


if __name__ == "__main__":
    main()
