"""Planted-pair embeddings fixture (r13): embeddings-only scaling
tiers whose NEAR-DUP structure stays Θ(rows), for measuring the
embedding near-dup family's third decade on a corpus that does not
densify.

Why: the standard .scratch/sfN embeddings slice is jittered
KEY-SHIFTED COPIES (make_sf10/make_sf100, σ=0.02 per decade) — right
for ANN top-k/range cells (output k-bounded, bulk cosine preserved),
but every base vector's descendants form a CLIQUE at near-identical
thresholds: cos(v+e1, v+e2) ≈ 0.995 for independent σ=0.02 jitters,
so by sf10 each of the 2,000 sf0.1 base vectors has ~100 descendants
and the 0.92-threshold pair count is ~copies²/2 per base — measured
8,446,173 pairs at sf10 (this harness's first run), extrapolating to
~10⁹ at sf100. A decade cell there measures the fixture's clique
densification, not the operator — the exact embedding-space analog
of the r11 fixed-vocabulary census finding that moved banded TEXT
dedup onto the Heaps corpus.

Shape here (all from one seeded generator, fully deterministic):
- tiers sf1/sf10/sf100 = 20k / 200k / 2M fresh unit-norm-ish Gaussian
  vectors (dim 64) — independent draws, so the bulk cosine mass sits
  near 0 (|cos| ≲ 0.5 tails at these sizes, far under 0.92),
- every 10th vector (vec_id % 10 == 0) gets a planted near-dup
  partner (vec_id + 1): the same direction plus σ=0.02 perturbation,
  cos ≈ 0.998 — Θ(rows) true pairs at near-identical thresholds,
  the structure the gates exist to find.

Writes .scratch/emb_planted/sf{1,10,100}/embeddings.parquet
(vec_id BIGINT, embedding LIST<FLOAT> — the columns the gate rows
read). Usage: python tools/make_emb_planted.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / ".scratch" / "emb_planted"
DIM = 64
SEED = 1301
TIERS = {"sf1": 20_000, "sf10": 200_000, "sf100": 2_000_000}


def make_tier(name: str, n: int) -> None:
    out_dir = OUT / name
    dst = out_dir / "embeddings.parquet"
    if dst.is_file():
        print(f"[skip] {name}: exists")
        return
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    rng = np.random.default_rng(SEED + n)
    vecs = rng.normal(0.0, 1.0, size=(n, DIM)).astype(np.float32)
    # plant: vec_id%10==0 -> its successor is a perturbed copy
    base = np.arange(0, n - 1, 10)
    vecs[base + 1] = (
        vecs[base]
        + rng.normal(0.0, 0.02, size=(len(base), DIM)).astype(np.float32)
    )
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1), type=pa.float32()), DIM
    ).cast(pa.list_(pa.float32()))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": arr,
    })
    tmp = str(dst) + ".tmp"
    pq.write_table(tbl, tmp)
    Path(tmp).replace(dst)
    print(f"[made] {name}: {n} vectors ({time.time() - t0:.1f}s)")


def main() -> int:
    for name, n in TIERS.items():
        make_tier(name, n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
