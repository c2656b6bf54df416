"""Third scale decade (sf10 → sf100): α(10→100) for the flat core
(r10, VERDICT r9 #5).

The sf100 slice (tools/make_sf100.py, ~24 GB) holds only lineitem /
orders / documents / events, so the default query set is the slice's
reason to exist: the reference workflow (sample_lineitem →
semijoin_orders), manifest_prune (events fixture), and the
documents-heavy LLM rows (ngram_dup_spans, bloom_decontaminate,
pack_sequences). Queries with a one-time session fixture
(bench_scaling.FIXTURES) split into setup + warm rows exactly like
the earlier decades, so the operator exponent never charges the
fixture write.

Usage: python tools/scale_decade3.py [query ...]
(run tools/make_sf1.py, make_sf10.py, make_sf100.py first)
Prints a markdown table for SCALING.md and one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from bench_scaling import FIXTURES, _fixture_builder  # noqa: E402

DEFAULT_QUERIES = [
    "sample_lineitem", "semijoin_orders", "manifest_prune",
    "ngram_dup_spans", "bloom_decontaminate", "pack_sequences",
]
# SPARK_GRAFT_SCALE_REPS=1 for multi-hundred-second rows (the banded
# dedup family at sf100) where 2 cold reps would double a multi-hour
# measurement for a best-of that host noise dominates anyway
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "2"))


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
    sf10 = REPO / ".scratch" / "sf10"
    sf100 = REPO / ".scratch" / "sf100"
    for d, gen in ((sf10, "make_sf10"), (sf100, "make_sf100")):
        if not d.is_dir():
            raise SystemExit(f"{d} missing — run tools/{gen}.py first")

    from parquet_sampler_spark import queries as registry
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("scale-decade3")
    qs = registry.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark.read.parquet(f"{sf10}/orders.parquet").count()  # warmup
    # plan-level warmup at sf1: the FIRST execution of a plan pays
    # whole-stage-codegen + first-shuffle costs ~3x its warm cost
    # (measured: minhash_pairs sf10 cold 96 s vs warm 29 s). At
    # REPS=1 the sf10 tier would pay it while the same-session sf100
    # tier ran warm, biasing every alpha DOWN — so warm each named
    # query once on the cheap sf1 slice before any timed cell.
    sf1 = REPO / ".scratch" / "sf1"
    if sf1.is_dir():
        for name in names:
            registry.clear_caches()
            if name in FIXTURES:
                _fixture_builder(name)(spark, str(sf1))
            _force(qs[name](spark, str(sf1)), name)
        registry.clear_caches()
        spark.sparkContext._jvm.System.gc()

    out_names = []
    for n in names:
        if n in FIXTURES:
            out_names.append(FIXTURES[n])
        out_names.append(n)
    times: dict[str, dict[str, float]] = {n: {} for n in out_names}
    for sf, sf_dir in (("10", str(sf10)), ("100", str(sf100))):
        for name in names:
            best = math.inf
            best_setup = math.inf
            for _ in range(REPS):
                registry.clear_caches()
                # force ContextCleaner GC so the previous rep's /
                # query's shuffle files are deleted NOW — in a long
                # local session they otherwise accumulate until the
                # JVM happens to GC, and the sf100 banded-dedup pass
                # fills the disk with orphaned shuffle data (r11:
                # two decade runs died on No-space-left before this)
                spark.sparkContext._jvm.System.gc()
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
            # incremental cell print: a crash on a later (bigger)
            # query must not lose completed measurements
            print(f"[cell] {name} sf{sf} {round(best, 3)}s"
                  + (f" setup={round(best_setup, 3)}s"
                     if name in FIXTURES else ""),
                  flush=True)

    print("| query | sf10 s | sf100 s | α(10→100) |")
    print("|---|---|---|---|")
    alphas = {}
    for name in out_names:
        t10, t100 = times[name]["10"], times[name]["100"]
        a = round(math.log(t100 / t10) / math.log(10.0), 2)
        alphas[name] = a
        print(f"| {name} | {t10} | {t100} | {a} |")
    print(json.dumps({"metric": "scale_decade3", "times": times,
                      "alpha": alphas}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
