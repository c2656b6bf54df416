"""Decade-3 cells for the banded dedup family on the Heaps-law
documents fixture (tools/make_docs_heaps.py) — the vocabulary grows
with the corpus, so the MinHash signature space does not saturate and
the cells measure the OPERATOR's exponent, not the standard fixture's
bounded-vocabulary artifact (see SCALING.md r11 census).

Protocol mirrors tools/scale_decade3.py: sf1-tier plan warmup (cold
first execution ≈ 3× warm), cache clear + forced shuffle-file GC
before each timed cell, single rep (SPARK_DRIVER_MEMORY=32g
recommended). Queries run the REGISTRY functions over the fixture
dirs — same code path as the gate rows. Queries with a one-time
standing-state fixture (bench_scaling.FIXTURES — e.g. the
minhash_incremental/minhash_admit corpus index) split into setup +
warm rows (r12 VERDICT #3: the Θ(batch) probe claim needs a cell
that does not carry the index build).

Usage: SPARK_DRIVER_MEMORY=32g python tools/scale_decade3_heaps.py \
    [query ...]   (default: minhash_pairs minhash_pairs_weighted_win)
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DEFAULT = ["minhash_pairs", "minhash_pairs_weighted_win"]


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
    names = sys.argv[1:] or DEFAULT
    root = REPO / ".scratch" / "docs_heaps"
    for tier in ("sf1", "sf10", "sf100"):
        if not (root / tier / "documents.parquet").exists():
            raise SystemExit(
                f"{root / tier} missing — run tools/make_docs_heaps.py"
            )

    from parquet_sampler_spark import queries as registry
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("scale-decade3-heaps")
    qs = registry.queries()

    sys.path.insert(0, str(REPO / "tools"))
    from bench_scaling import FIXTURES, _fixture_builder

    def run(name, tier):
        registry.clear_caches()
        spark.sparkContext._jvm.System.gc()
        setup = None
        if name in FIXTURES:
            t0 = time.perf_counter()
            _fixture_builder(name)(spark, str(root / tier))
            setup = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        cnt = _force(qs[name](spark, str(root / tier)), name)
        return round(time.perf_counter() - t0, 3), cnt, setup

    out_names = []
    for n in names:
        if n in FIXTURES:
            out_names.append(FIXTURES[n])
        out_names.append(n)
    times: dict[str, dict[str, float]] = {n: {} for n in out_names}
    rows: dict[str, dict[str, int]] = {n: {} for n in names}
    for name in names:
        run(name, "sf1")  # plan warmup, untimed tier
        for tier in ("sf10", "sf100"):
            dt, cnt, setup = run(name, tier)
            times[name][tier] = dt
            rows[name][tier] = cnt
            if setup is not None:
                times[FIXTURES[name]][tier] = setup
            print(f"[cell] {name} {tier} {dt}s rows={cnt}"
                  + (f" setup={setup}s" if setup is not None else ""),
                  flush=True)

    print("| query | sf10 s | sf100 s | α(10→100) | pairs sf10 → sf100 |")
    print("|---|---|---|---|---|")
    alphas = {}
    for n in out_names:
        t10, t100 = times[n]["sf10"], times[n]["sf100"]
        a = round(math.log(t100 / t10) / math.log(10.0), 2)
        alphas[n] = a
        nrows = (f"{rows[n]['sf10']} → {rows[n]['sf100']}"
                 if n in rows else "")
        print(f"| {n} | {t10} | {t100} | {a} | {nrows} |")
    print(json.dumps({"metric": "scale_decade3_heaps", "times": times,
                      "rows": rows, "alpha": alphas}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
