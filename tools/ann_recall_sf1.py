"""Measure ANN recall@10 at the local sf1 scale (VERDICT r06 task 5).

The recall unit tests pin lsh/ivf against brute force at sf0.01; the
sf1 SCALING.md rows record *times* only. This tool closes the gap: on
the 10x jittered embeddings (tools/make_sf1.py — cross-copy exact
twins deliberately broken, bulk cosine distribution preserved) it
computes exact brute-force top-10 for NQ queries, then recall@10 of

* lsh_topk at the registry's parameters (4 bits x 16 tables), and
* ivf_topk at nlist 16, nprobe 6 and 8 (the registry runs nprobe 8),

as |approx-pairs ∩ exact-pairs| / |exact-pairs| over (query, neighbor)
pairs. Expectation one decade up: IVF recall tracks the probed
fraction (nprobe/nlist worth of the nearest cells, typically well
above the raw cell fraction because neighbors concentrate in the
query's nearest cells); LSH recall follows the banding s-curve of the
bucket-collision probability — neither should fall off a cliff just
because the corpus is 10x denser.

``--clustered`` (r8 VERDICT #6) swaps the corpus for a seeded
20k-vector MIXTURE OF GAUSSIANS (Zipf-weighted cluster sizes, so the
coarse quantizer faces hot cells and near-empty cells) — the density
shape on which IVF recall actually degrades; the uniform-density sf1
corpus cannot exhibit it. Reports the same variants plus an IVF
nprobe sweep (2/4/6/8) for sensitivity.

Usage: python tools/ann_recall_sf1.py [--clustered]
(prints markdown + one JSON line)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF1 = REPO / ".scratch" / "sf1"
NQ = 50
K = 10


def pairs(df) -> set:
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def clustered_corpus(spark, n: int = 20_000, dim: int = 64,
                     n_clusters: int = 12, seed: int = 7):
    """Seeded mixture-of-Gaussians corpus with Zipf cluster weights:
    cluster c holds ~n/(c+1)/H_k vectors, so the coarse quantizer sees
    a few HOT cells holding most of the mass and a tail of near-empty
    ones — exactly the layout where fixed nprobe under-probes (the
    query's true neighbors concentrate in a hot cell that k-means may
    SPLIT across several centroids). Centroid spread 1.0, in-cluster
    σ 0.15 (≈ the sf1 corpus's bulk-to-neighbor cosine contrast).
    Cluster assignment is shuffled across vec_id, so the NQ query ids
    sample all clusters, hot and cold."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    weights = 1.0 / np.arange(1, n_clusters + 1)
    weights /= weights.sum()
    assign = rng.choice(n_clusters, size=n, p=weights)
    centroids = rng.normal(0.0, 1.0, size=(n_clusters, dim))
    vecs = (centroids[assign]
            + rng.normal(0.0, 0.15, size=(n, dim))).astype(np.float32)
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(vecs),
    })
    return spark.createDataFrame(pdf), np.bincount(
        assign, minlength=n_clusters
    ).tolist()


def main() -> int:
    clustered = "--clustered" in sys.argv

    from pyspark.sql import functions as F

    from parquet_sampler_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        lsh_topk,
    )
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("ann-recall-sf1")
    if clustered:
        e, sizes = clustered_corpus(spark)
        e = e.cache()
        print(f"clustered corpus, cluster sizes: {sizes}")
    else:
        if not (SF1 / "embeddings.parquet").is_file():
            raise SystemExit("run tools/make_sf1.py first")
        e = spark.read.parquet(str(SF1 / "embeddings.parquet"))
    q = e.filter(F.col("vec_id") < NQ)
    n = e.count()

    exact = pairs(cosine_topk(e, q, "vec_id", "embedding", k=K))

    results: dict[str, float] = {}
    lsh = pairs(lsh_topk(
        e, q, "vec_id", "embedding", k=K, bits=4, tables=16, dim=64,
        seed=42,
    ))
    results["lsh_4x16"] = len(lsh & exact) / len(exact)

    # nprobe sweep on the clustered corpus (sensitivity is the point
    # there); the uniform corpus keeps the original 6/8 pair
    for nprobe in (2, 4, 6, 8) if clustered else (6, 8):
        ivf = pairs(ivf_topk(
            e, q, "vec_id", "embedding", k=K, nlist=16, nprobe=nprobe,
            seed=42,
        ))
        results[f"ivf_16_np{nprobe}"] = len(ivf & exact) / len(exact)

    from parquet_sampler_spark.operators.similarity import pq_topk

    pq_res = pairs(pq_topk(
        e, q, "vec_id", "embedding", k=K, m_sub=16, ncodes=16,
        rerank=100, seed=42,
    ))
    results["pq_16x16_rr100"] = len(pq_res & exact) / len(exact)

    from parquet_sampler_spark.operators.similarity import ivfpq_topk

    ivfpq = pairs(ivfpq_topk(
        e, q, "vec_id", "embedding", k=K, nlist=16, nprobe=8,
        m_sub=16, ncodes=16, rerank=100, seed=42,
    ))
    results["ivfpq_np8_rr100"] = len(ivfpq & exact) / len(exact)

    if clustered:
        # the recovery ladder for the measured raw-code collapse:
        # residual encoding (FAISS IVFADC), then residual + 8-bit
        # codebooks — the production shape on clustered data
        for label, kwargs in (
            ("ivfpq_np8_residual", dict(ncodes=16, residual=True)),
            ("ivfpq_np8_residual_8bit",
             dict(ncodes=256, residual=True)),
            ("ivfpq_np8_raw_8bit", dict(ncodes=256)),
        ):
            r = pairs(ivfpq_topk(
                e, q, "vec_id", "embedding", k=K, nlist=16, nprobe=8,
                m_sub=16, rerank=100, seed=42, **kwargs,
            ))
            results[label] = len(r & exact) / len(exact)

    label = "clustered-20k" if clustered else "sf1"
    print(f"corpus: {label}, {n} vectors, {NQ} queries, k={K}")
    print("| variant | recall@10 |")
    print("|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r:.3f} |")
    print(json.dumps({
        "metric": f"ann_recall_{label}", "n_vectors": n, "nq": NQ,
        "k": K,
        "recall": {k2: round(v, 4) for k2, v in results.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
