"""Second scale decade (sf1 → sf10) for the α ≥ 0.5 tail — VERDICT
r07 #3.

`tpch_q13` (0.55), `streaming_sessionize` (0.61, the Python-state
fold) and `sql_correlated_subquery` (0.50) were the only registered
defaults above α 0.5 on the sf0.1→sf1 step. An exponent near the
noise floor at ONE decade can't distinguish "approaching linear" from
"fixed overhead still amortizing", so this runs exactly those three
at sf1 and at the make_sf10.py slice and reports α(1→10): stable or
falling exponents close the question; α > 1 names a plan to fix.

Usage: python tools/scale_decade2.py  (after tools/make_sf10.py)
Prints a markdown table for SCALING.md and one JSON line.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = ["tpch_q13", "sql_correlated_subquery", "streaming_sessionize"]
REPS = 2


def main() -> int:
    sf1 = REPO / ".scratch" / "sf1"
    sf10 = REPO / ".scratch" / "sf10"
    for d, gen in ((sf1, "make_sf1"), (sf10, "make_sf10")):
        if not d.is_dir():
            raise SystemExit(f"{d} missing — run tools/{gen}.py first")

    from parquet_sampler_spark import queries as registry
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("scale-decade2")
    qs = registry.queries()
    spark.read.parquet(f"{sf1}/lineitem.parquet").count()  # warmup

    times: dict[str, dict[str, float]] = {n: {} for n in QUERIES}
    for sf, sf_dir in (("1", str(sf1)), ("10", str(sf10))):
        for name in QUERIES:
            best = math.inf
            for _ in range(REPS):
                registry.clear_caches()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            times[name][sf] = round(best, 3)

    print("| query | sf1 s | sf10 s | α(1→10) |")
    print("|---|---|---|---|")
    alphas = {}
    for name in QUERIES:
        t1, t10 = times[name]["1"], times[name]["10"]
        a = round(math.log(t10 / t1) / math.log(10.0), 2)
        alphas[name] = a
        print(f"| {name} | {t1} | {t10} | {a} |")
    print(json.dumps({"metric": "scale_decade2", "times": times,
                      "alpha": alphas}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
