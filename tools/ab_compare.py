"""Analyze the interleaved r5-vs-r6 bench A/B (VERDICT r06 task 2).

Input: .scratch/ab_{r5,r6}_run{1,2,3}.json — six full BENCH_LOCAL
payloads produced by running the r5 (f431df6) and r6 (b476fda)
worktrees' bench.py ALTERNATELY on the same host (r5, r6, r5, r6, ...),
so every host-noise epoch hits both versions equally.

Output: per-query median-of-3 for each version over their COMMON
entries, the total drift, and a table of every query whose median
moved more than MOVER_X between versions — the judge's question was
whether the +14% common-subset drift r5->r6 was host noise or real;
medians over interleaved runs answer it. Also prints each version's
own run-to-run spread (max/min of totals) as the noise band.

Usage: python tools/ab_compare.py
"""

from __future__ import annotations

import json
import statistics
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRATCH = REPO / ".scratch"
MOVER_X = 1.3


def load(version: str) -> list[dict]:
    runs = []
    for i in (1, 2, 3):
        p = SCRATCH / f"ab_{version}_run{i}.json"
        if not p.is_file():  # committed copy (scratch is ephemeral)
            p = REPO / "artifacts" / f"ab_{version}_run{i}.json"
        runs.append(json.loads(p.read_text())["queries"])
    return runs


def main() -> int:
    r5_runs, r6_runs = load("r5"), load("r6")
    common = sorted(
        set(r5_runs[0]) & set(r6_runs[0])
    )

    med5 = {q: statistics.median(r[q] for r in r5_runs) for q in common}
    med6 = {q: statistics.median(r[q] for r in r6_runs) for q in common}

    tot5_runs = [sum(r[q] for q in common) for r in r5_runs]
    tot6_runs = [sum(r[q] for q in common) for r in r6_runs]
    tot5, tot6 = sum(med5.values()), sum(med6.values())

    print(f"common entries: {len(common)}")
    print(f"r5 totals per run: {[round(t, 1) for t in tot5_runs]}  "
          f"spread x{max(tot5_runs) / min(tot5_runs):.2f}")
    print(f"r6 totals per run: {[round(t, 1) for t in tot6_runs]}  "
          f"spread x{max(tot6_runs) / min(tot6_runs):.2f}")
    print(f"median-of-3 common-subset total: r5 {tot5:.1f}s  "
          f"r6 {tot6:.1f}s  ratio {tot6 / tot5:.3f}")

    movers = [
        (q, med5[q], med6[q], med6[q] / max(med5[q], 1e-9))
        for q in common
        if max(med5[q], med6[q]) > 0.15
        and (med6[q] / max(med5[q], 1e-9) > MOVER_X
             or med5[q] / max(med6[q], 1e-9) > MOVER_X)
    ]
    movers.sort(key=lambda t: -abs(t[3] - 1))
    print(f"\nmovers > x{MOVER_X} (median vs median, >0.15s):")
    print("| query | r5 med s | r6 med s | ratio |")
    print("|---|---|---|---|")
    for q, a, b, x in movers:
        print(f"| {q} | {a:.2f} | {b:.2f} | {x:.2f} |")

    print(json.dumps({
        "metric": "ab_r5_r6",
        "common": len(common),
        "total_r5_median": round(tot5, 1),
        "total_r6_median": round(tot6, 1),
        "ratio": round(tot6 / tot5, 3),
        "spread_r5": round(max(tot5_runs) / min(tot5_runs), 3),
        "spread_r6": round(max(tot6_runs) / min(tot6_runs), 3),
        "movers": {q: round(x, 2) for q, _, _, x in movers},
    }))
    return 0


if __name__ == "__main__":
    main()
