"""Second scale decade (sf1 → sf10): α(1→10) for registry queries.

Grew out of VERDICT r07 #3 (the α ≥ 0.5 tail: tpch_q13,
sql_correlated_subquery, streaming_sessionize); r8 VERDICT #4 widens
it to the heavy families whose 100 TB story is the point — the dup
graph (jaccard_pairs_capped, minhash_pairs, cluster_dedup,
pagerank_dups), ANN (ann_lsh, ann_ivfpq) and the streaming sketch
rows — so the tool now takes query names on the command line.

An exponent near the noise floor at ONE decade can't distinguish
"approaching linear" from "fixed overhead still amortizing"; a second
measured decade closes the question: stable or falling exponents are
the sub-linear claim, α > 1 names a plan to fix.

Queries with a one-time session fixture (bench_scaling.FIXTURES) are
split into a setup row and a warm-fixture query row, so the operator
exponent never charges the fixture rewrite (r8 VERDICT #3).

Usage: python tools/scale_decade2.py [query ...]
(defaults to the r07 tail; run tools/make_sf1.py + make_sf10.py first)
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
sys.path.insert(0, str(REPO / "tools"))

from bench_scaling import FIXTURES, _fixture_builder  # noqa: E402

DEFAULT_QUERIES = [
    "tpch_q13", "sql_correlated_subquery", "streaming_sessionize",
]
REPS = 2


def _force(df, name):
    """Force full execution: FULL_EVAL_ROWS' count-plans eliminate
    their real work (bench.py) — hash-fold every column instead."""
    from bench import FULL_EVAL_ROWS

    if name in FULL_EVAL_ROWS:
        from pyspark.sql import functions as F

        df.agg(F.expr(
            "bit_xor(xxhash64(" + ", ".join(df.columns) + "))"
        )).collect()
        return df.count()
    return df.count()


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    sf1 = REPO / ".scratch" / "sf1"
    sf10 = REPO / ".scratch" / "sf10"
    for d, gen in ((sf1, "make_sf1"), (sf10, "make_sf10")):
        if not d.is_dir():
            raise SystemExit(f"{d} missing — run tools/{gen}.py first")

    from parquet_sampler_spark import queries as registry
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("scale-decade2")
    qs = registry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark.read.parquet(f"{sf1}/lineitem.parquet").count()  # warmup

    out_names = []
    for n in names:
        if n in FIXTURES:
            out_names.append(FIXTURES[n])
        out_names.append(n)
    times: dict[str, dict[str, float]] = {n: {} for n in out_names}
    for sf, sf_dir in (("1", str(sf1)), ("10", str(sf10))):
        for name in names:
            best = math.inf
            best_setup = math.inf
            for _ in range(REPS):
                registry.clear_caches()
                if name in FIXTURES:
                    t0 = time.perf_counter()
                    _fixture_builder(name)(spark, sf_dir)
                    best_setup = min(
                        best_setup, time.perf_counter() - t0
                    )
                t0 = time.perf_counter()
                _force(qs[name](spark, sf_dir), name)
                best = min(best, time.perf_counter() - t0)
            times[name][sf] = round(best, 3)
            if name in FIXTURES:
                times[FIXTURES[name]][sf] = round(best_setup, 3)

    print("| query | sf1 s | sf10 s | α(1→10) |")
    print("|---|---|---|---|")
    alphas = {}
    for name in out_names:
        t1, t10 = times[name]["1"], times[name]["10"]
        a = round(math.log(t10 / t1) / math.log(10.0), 2)
        alphas[name] = a
        print(f"| {name} | {t1} | {t10} | {a} |")
    print(json.dumps({"metric": "scale_decade2", "times": times,
                      "alpha": alphas}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
