"""Compare two bench snapshots on their common entries, normalized by
the host-noise calibration row (r8 VERDICT #5).

Same-code bench totals swing ×1.15 between runs on this host, so raw
cross-round totals cannot tell a regression from a noisy neighbor.
This tool compares two BENCH_LOCAL-style payloads (bench.py's full
per-query record, ``raw`` passes included) by:

1. common-subset per-query MEDIANS (across each snapshot's raw
   passes when present, else the recorded value),
2. the ratio of common-subset totals,
3. the ratio of the ``calibration_cpu`` rows (a fixed CPU+shuffle
   workload timed per pass — pure host drift), and
4. the NORMALIZED ratio = suite ratio / calibration ratio — the
   number a round verdict should cite: >1 after normalization means
   the code got slower beyond what the host alone explains.

Snapshots that predate the calibration row (≤ r8) compare with
calibration ratio 1.0 and a warning — i.e. the old raw behavior.

Usage: python tools/ab_compare.py OLD.json NEW.json
(e.g. BENCH_LOCAL_r08.json BENCH_LOCAL.json)

The original r5-vs-r6 interleaved A/B files this tool grew out of
remain readable: artifacts/ab_{r5,r6}_run{1,2,3}.json are plain
BENCH_LOCAL payloads — pass any one pair.
"""

from __future__ import annotations

import json
import statistics
import sys
from pathlib import Path

MOVER_X = 1.3
CAL_ROW = "calibration_cpu"


def load(path: str) -> tuple[dict[str, float], list[dict[str, float]]]:
    """Return (per-query medians-across-passes, raw passes)."""
    payload = json.loads(Path(path).read_text())
    queries = payload["queries"]
    raw = payload.get("raw") or [queries]
    med = {
        q: statistics.median(p[q] for p in raw if q in p)
        for q in queries
    }
    return med, raw


def main() -> int:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    old_path, new_path = sys.argv[1], sys.argv[2]
    old, old_raw = load(old_path)
    new, new_raw = load(new_path)

    common = sorted((set(old) & set(new)) - {CAL_ROW})
    tot_old = sum(old[q] for q in common)
    tot_new = sum(new[q] for q in common)
    ratio = tot_new / tot_old

    if CAL_ROW in old and CAL_ROW in new:
        cal_ratio = new[CAL_ROW] / old[CAL_ROW]
        cal_note = (
            f"calibration: old {old[CAL_ROW]:.2f}s  "
            f"new {new[CAL_ROW]:.2f}s  ratio {cal_ratio:.3f}"
        )
    else:
        cal_ratio = 1.0
        cal_note = (
            "calibration: row missing in at least one snapshot "
            "(pre-r9) — reporting the RAW ratio"
        )
    norm_ratio = ratio / cal_ratio

    def spread(raw: list[dict[str, float]]) -> float:
        # only passes covering the FULL common subset are comparable —
        # substituting 0.0 for a missing query deflated that pass's
        # total and overstated the spread on heterogeneous pass sets
        tots = [
            sum(p[q] for q in common)
            for p in raw
            if all(q in p for q in common)
        ]
        if not tots or min(tots) <= 0:
            return float("nan")
        return max(tots) / min(tots)

    print(f"common entries: {len(common)}")
    print(f"old ({old_path}): {tot_old:.1f}s over common subset, "
          f"pass spread x{spread(old_raw):.2f}")
    print(f"new ({new_path}): {tot_new:.1f}s over common subset, "
          f"pass spread x{spread(new_raw):.2f}")
    print(cal_note)
    print(f"raw ratio {ratio:.3f}  ->  host-normalized ratio "
          f"{norm_ratio:.3f}")

    movers = [
        (q, old[q], new[q], new[q] / max(old[q], 1e-9))
        for q in common
        if max(old[q], new[q]) > 0.15
        and (new[q] / max(old[q], 1e-9) > MOVER_X
             or old[q] / max(new[q], 1e-9) > MOVER_X)
    ]
    movers.sort(key=lambda t: -abs(t[3] - 1))
    print(f"\nmovers > x{MOVER_X} (median vs median, >0.15s):")
    print("| query | old med s | new med s | ratio |")
    print("|---|---|---|---|")
    for q, a, b, x in movers:
        print(f"| {q} | {a:.2f} | {b:.2f} | {x:.2f} |")

    print(json.dumps({
        "metric": "ab_compare",
        "old": old_path,
        "new": new_path,
        "common": len(common),
        "total_old_median": round(tot_old, 1),
        "total_new_median": round(tot_new, 1),
        "raw_ratio": round(ratio, 3),
        "calibration_ratio": round(cal_ratio, 3),
        "normalized_ratio": round(norm_ratio, 3),
        "movers": {q: round(x, 2) for q, _, _, x in movers},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
