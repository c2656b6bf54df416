"""Measure hierarchical ANN probe routing vs flat centroid scan
(r10, VERDICT r9 #2 'probe cost measured vs flat').

Two measurements:

1. RECALL cost of routing, on the seeded clustered 20k corpus
   (tools/ann_recall_sf1.clustered_corpus) at nlist=128, nprobe=16:
   ``nprobe_super=4`` (the registered ann_ivf_hier shape) vs
   ``nprobe_super >= k1`` — with every super selected the routed
   candidate set IS the flat scan's, so the pair isolates exactly the
   coarse-routing miss class.

2. PROBE-SIDE CPU cost, numpy microbench of ``_route_probe`` at the
   nlist ∝ corpus regime the module recommends (nlist = rows/256):
   batches of query vectors against 1024 cells — flat scans all 1024
   centroids per query, routed scans 32 supers + 4·32 subs.

Usage: python tools/hier_probe_study.py
(prints markdown + one JSON line)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    import importlib.util

    import numpy as np

    from pyspark.sql import functions as F

    from parquet_sampler_spark.operators.similarity import (
        _fit_coarse_hierarchy,
        _ivf_quantize,
        _route_probe,
        cosine_topk,
        ivf_topk,
    )
    from parquet_sampler_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "ann_recall_sf1", REPO / "tools" / "ann_recall_sf1.py"
    )
    tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tool)

    spark = get_spark("hier-probe-study")
    e, _sizes = tool.clustered_corpus(spark)
    e = e.cache()
    q = e.filter(F.col("vec_id") < 50)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(e, q, "vec_id", "embedding",
                                  k=10).collect()}

    def rec(nsup: int) -> float:
        got = {(r.query_id, r.neighbor_id) for r in ivf_topk(
            e, q, "vec_id", "embedding", k=10, nlist=128, nprobe=16,
            seed=42, nprobe_super=nsup,
        ).collect()}
        return len(got & exact) / len(exact)

    routed = rec(4)
    # k1 = ceil(sqrt(128)) = 12 supers: nsup=12 selects every super, so
    # the probe set equals the flat scan's nprobe-nearest cells exactly
    flat = rec(12)

    # --- numpy probe-cost microbench at nlist = 1024 ------------------
    rng = np.random.default_rng(5)
    dim, nlist, nq = 64, 1024, 20_000
    X = rng.normal(0.0, 1.0, size=(nlist * 16, dim))
    supers, cents, owner = _fit_coarse_hierarchy(X, nlist, 5, 5)
    cq, sq = _ivf_quantize(cents), _ivf_quantize(supers)
    Q = _ivf_quantize(rng.normal(0.0, 1.0, size=(nq, dim)))
    t0 = time.perf_counter()
    _route_probe(Q, cq, None, None, 16, 4)
    t_flat = time.perf_counter() - t0
    t0 = time.perf_counter()
    _route_probe(Q, cq, sq, owner, 16, 4)
    t_routed = time.perf_counter() - t0

    print("| measurement | flat | routed (nsup=4) |")
    print("|---|---|---|")
    print(f"| recall@10, clustered 20k, nlist=128 np=16 "
          f"| {flat:.3f} | {routed:.3f} |")
    print(f"| probe CPU, {nq} queries x {len(cq)} cells (numpy s) "
          f"| {t_flat:.2f} | {t_routed:.2f} |")
    print(json.dumps({
        "metric": "hier_probe_study",
        "recall_flat": round(flat, 4),
        "recall_routed": round(routed, 4),
        "probe_cpu_flat_s": round(t_flat, 3),
        "probe_cpu_routed_s": round(t_routed, 3),
        "ncells": int(len(cq)),
        "nsupers": int(len(sq)),
        "nq": nq,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
