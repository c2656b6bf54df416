"""Measure semantic_dedup's planted near-dup DROP RECALL — the
quantified cost of SemDeDup's cross-cell miss class (Abbas et al.
2023: a near-dup pair split across two KMeans cells is never
compared).

Protocol: take a real embedding corpus, plant a jittered near-copy of
every 5th vector (seeded gaussian jitter scaled so cos(copy, original)
lands ~0.95-0.99 — above the tau=0.92 sweep threshold), run
semantic_dedup at the registry's nlist = rows // 256 rule, and report
the fraction of planted copies dropped. A miss can only be a copy
assigned to a different cell than its original (the sweep inside a
shared cell is exact). Isotropic gaussian corpora are the ADVERSARIAL
case: points sit near cell boundaries everywhere, so jitter crosses
cells as often as it ever will; clustered real corpora do better.

Also reports extra_drops — drops beyond the planted set. At dim 64 a
cosine >= 0.92 between independent gaussians is essentially impossible,
so on this corpus extra_drops counts the corpus's own jittered
structure (the sf1 slice is built from jittered copies), not false
positives: the sweep itself never over-drops (pairwise cosines are
exact).

Usage: python tools/semdedup_recall.py [sf_dir] [--tau T] [--jitter J]
Defaults: .scratch/sf1, tau 0.92, jitter 0.18 (cos ~ 0.984).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

OFFSET = 1_000_000_000
EVERY = 5


def main() -> None:
    tau = 0.92
    jitter = 0.18
    pos: list[str] = []
    toks = sys.argv[1:]
    i = 0
    while i < len(toks):
        if toks[i] == "--tau":
            tau = float(toks[i + 1])
            i += 2
        elif toks[i] == "--jitter":
            jitter = float(toks[i + 1])
            i += 2
        else:
            pos.append(toks[i])
            i += 1
    sf_dir = pos[0] if pos else str(REPO / ".scratch" / "sf1")

    import pyarrow.parquet as pq

    from parquet_sampler_spark.operators.similarity import semantic_dedup
    from parquet_sampler_spark.session import get_spark

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = tbl.column("vec_id").to_numpy()
    X = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    n, dim = X.shape

    rng = np.random.default_rng(20260815)
    mask = ids % EVERY == 0
    base = X[mask]
    noise = rng.standard_normal(base.shape)
    # scale noise per-row so the planted cosine is ~1/sqrt(1+j^2)
    bn = base / np.linalg.norm(base, axis=1, keepdims=True)
    nn = noise - (noise * bn).sum(axis=1, keepdims=True) * bn  # orthogonal
    nn = nn / np.linalg.norm(nn, axis=1, keepdims=True)
    copies = bn + jitter * nn
    planted_cos = 1.0 / np.sqrt(1.0 + jitter * jitter)
    planted_ids = ids[mask] + OFFSET

    spark = get_spark("semdedup-recall")
    all_ids = np.concatenate([ids, planted_ids])
    all_vecs = np.concatenate([X, copies])
    rows = [(int(i), [float(x) for x in v])
            for i, v in zip(all_ids, all_vecs)]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    nlist = max(16, n // 256)
    kept = semantic_dedup(df, "vec_id", "v", nlist=nlist, tau=tau,
                          seed=42)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    planted = set(int(i) for i in planted_ids)
    dropped_planted = len(planted - kept_ids)
    extra = len(set(int(i) for i in all_ids) - kept_ids) - dropped_planted
    recall = dropped_planted / len(planted)
    print(f"corpus={n} planted={len(planted)} nlist={nlist} "
          f"tau={tau} planted_cos={planted_cos:.4f}")
    print(f"drop_recall={recall:.4f} "
          f"({dropped_planted}/{len(planted)}), extra_drops={extra}")
    import json

    print(json.dumps({"metric": "semdedup_drop_recall", "corpus": n,
                      "nlist": nlist, "tau": tau,
                      "planted_cos": round(planted_cos, 4),
                      "recall": round(recall, 4),
                      "extra_drops": extra}))


if __name__ == "__main__":
    main()
