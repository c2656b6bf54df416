"""Generate a LOCAL sf10 slice (10× the make_sf1.py output) for the
second scale decade VERDICT r07 #3 asks about.

Only the α ≥ 0.5 tail of the sf0.1→sf1 table needs another decade —
`tpch_q13` (customer ⟕ orders), `sql_correlated_subquery`
(orders + lineitem decorrelated join), `streaming_sessionize`
(events) — so only the FOUR tables those queries read are amplified,
into ``.scratch/sf10/`` (gitignored, ~2 GB). Same key-shifted-copies
shape as make_sf1.py with strides one decade wider: key cardinality
grows 10×, per-key distributions (orders per customer, lineitems per
order, events per user/session) are preserved exactly — the scaling
shape of a 10× corpus is more keys, not hotter keys, and these three
queries aggregate/join/fold PER KEY, so preserved per-key volume is
exactly what their exponents should be measured against.

Requires .scratch/sf1 (run tools/make_sf1.py first).
Deterministic (pure key arithmetic). Usage: python tools/make_sf10.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / ".scratch" / "sf1"
OUT = REPO / ".scratch" / "sf10"
COPIES = 10
# one decade past the sf1 strides; customer stride stays a multiple
# of 100 so the CDC mod-100 update classes survive a further decade
CUST_STRIDE = 1_000_000
ORDER_STRIDE = 100_000_000
EVENT_STRIDE = 10_000_000
USER_STRIDE = 1_000_000
DOC_STRIDE = 1_000_000


def amplify_embeddings() -> None:
    """10 vec_id-shifted, Gaussian-jittered copies of the SF1
    embeddings (same recipe as make_sf1.amplify_embeddings, one
    decade wider — r8 VERDICT #4: the ANN family needs a measured
    sf1→sf10 step). Verbatim copies would plant 9 exact twins per
    vector and every ANN/near-dup timing would measure an artifact;
    σ=0.02 seeded jitter preserves the bulk cosine distribution.
    Scale-TREND timing only; oracle parity stays on driver data."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    vec_ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.array(t.column("label").to_pylist())
    rng = np.random.default_rng(977)
    stride = int(vec_ids.max()) + 1
    all_ids, all_vecs, all_labels = [], [], []
    for k in range(COPIES):
        all_ids.append(vec_ids + k * stride)
        all_vecs.append(
            vecs if k == 0
            else vecs
            + rng.normal(0.0, 0.02, size=vecs.shape).astype(np.float32)
        )
        all_labels.append(labels)
    out = pa.table({
        "vec_id": pa.array(np.concatenate(all_ids), type=pa.int64()),
        "embedding": pa.array(
            list(np.concatenate(all_vecs)), type=pa.list_(pa.float32())
        ),
        "label": pa.array(np.concatenate(all_labels).tolist(),
                          type=pa.int32()),
    })
    pq.write_table(out, OUT / "embeddings.parquet")
    print(f"embeddings: {out.num_rows} rows (jittered copies)")


def main() -> int:
    needed = ["customer", "orders", "lineitem", "events"]
    missing = [t for t in needed if not (SRC / f"{t}.parquet").is_file()]
    if missing:
        raise SystemExit(
            f"run tools/make_sf1.py first (missing in sf1: {missing})"
        )
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    plans = {
        "customer": f"c_custkey + {{k}} * {CUST_STRIDE} AS c_custkey",
        "orders": (
            f"o_orderkey + {{k}} * {ORDER_STRIDE} AS o_orderkey, "
            f"o_custkey + {{k}} * {CUST_STRIDE} AS o_custkey"
        ),
        "lineitem": f"l_orderkey + {{k}} * {ORDER_STRIDE} AS l_orderkey",
        "events": (
            f"event_id + {{k}} * {EVENT_STRIDE} AS event_id, "
            f"user_id + {{k}} * {USER_STRIDE} AS user_id"
        ),
        # key-shifted copies only — per-source language mixes are
        # preserved exactly, so mixture_drift's statistic scales its
        # counts 10x with identical structure
        "documents": f"doc_id + {{k}} * {DOC_STRIDE} AS doc_id",
    }
    # scale-invariant dims needed by registry rows (dpp_scan joins
    # region): copy through unchanged
    # (nation/part/supplier added r12: star_snapshot reduces every
    # dimension, and the realistic 10x story is a fact table growing
    # against fixed dims)
    import shutil
    for dim in ("region", "nation", "part", "supplier"):
        shutil.copyfile(SRC / f"{dim}.parquet", OUT / f"{dim}.parquet")
        print(f"{dim}: copied (scale-invariant)")
    amplify_embeddings()
    for t, repl in plans.items():
        src = SRC / f"{t}.parquet"
        union = " UNION ALL ".join(
            f"SELECT * REPLACE ({repl.format(k=k)}) FROM '{src}'"
            for k in range(COPIES)
        )
        con.execute(
            f"COPY ({union}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
