"""Generate a LOCAL sf100 slice — the THIRD scale decade for the flat
core (r10, VERDICT r9 #5).

Only the tables the targeted queries read are amplified (disk budget
~24 GB): ``lineitem`` + ``orders`` for the reference workflow
(sample → semi-join chain), ``events`` for manifest_prune,
``documents`` for ngram_dup_spans / bloom_decontaminate /
pack_sequences, ``customer`` (+ verbatim region/nation/part/supplier
dims) for the star_snapshot family's third decade, and ``embeddings``
(jittered vec_id-shifted copies, the make_sf10 recipe one decade
wider — r12 VERDICT #1: the embedding/ANN family's decade-3 cells
need a 2M-vector slice). Same key-shifted-copies shape as make_sf10.py with
strides one further decade wider: key cardinality grows 10×, per-key
distributions (lineitems per order, events per user, docs per source)
are preserved exactly — a 100× corpus means more keys, not hotter
keys, and these queries aggregate/join/fold PER KEY.

Requires .scratch/sf10 (run tools/make_sf1.py then tools/make_sf10.py
first). Deterministic (pure key arithmetic).
Usage: python tools/make_sf100.py

BANDED-DEDUP CAVEAT (r11 census, r12 resolution): the ``documents``
slice here inherits the generator's FIXED 31-token vocabulary, so by
sf100 the MinHash signature space saturates (bucket count frozen at
371,146 across the decade while band pairs grow ×108) and decade-3
cells for the banded pair family measure the FIXTURE, not the
operator. Do NOT use this slice for minhash/simhash/jaccard pair
decade cells — use ``tools/make_docs_heaps.py`` (vocabulary grows
∝ √tokens, Heaps' law) + ``tools/scale_decade3_heaps.py``, the
canonical banded-scaling corpus since r11. This slice remains right
for the flat core (span dedup, bloom, packing, quality): those fold
per token/key and never form signature buckets.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
SRC = REPO / ".scratch" / "sf10"
OUT = REPO / ".scratch" / "sf100"
COPIES = 10
# one decade past the sf10 strides; customer stride stays a multiple
# of 100 so the CDC mod-100 update classes would survive yet another
# decade (orders carries o_custkey through)
CUST_STRIDE = 10_000_000
ORDER_STRIDE = 1_000_000_000
EVENT_STRIDE = 100_000_000
USER_STRIDE = 10_000_000
DOC_STRIDE = 10_000_000


def amplify_embeddings() -> None:
    """10 vec_id-shifted, Gaussian-jittered copies of the SF10
    embeddings (the make_sf1/make_sf10 recipe, one decade wider):
    verbatim copies would plant 9 exact twins per vector and every
    ANN/near-dup decade cell would measure an artifact; σ=0.02 seeded
    jitter preserves the bulk cosine distribution. Scale-TREND timing
    only; oracle parity stays on driver data. Arrow-flattened load
    (2M × 64 float32 ≈ 512 MB — to_pylist would be ~10× slower)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dst = OUT / "embeddings.parquet"
    if dst.is_file():
        print("embeddings: exists, skipping")
        return
    t = pq.read_table(SRC / "embeddings.parquet")
    emb = t.column("embedding").combine_chunks()
    dim = len(emb[0])
    vecs = np.asarray(emb.flatten(), dtype=np.float32).reshape(-1, dim)
    vec_ids = np.asarray(t.column("vec_id"), dtype=np.int64)
    labels = np.asarray(t.column("label"), dtype=np.int32)
    rng = np.random.default_rng(3511)
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
    flat = np.concatenate(all_vecs).reshape(-1)
    n = len(flat) // dim
    arr = pa.FixedSizeListArray.from_arrays(
        pa.array(flat, type=pa.float32()), dim
    ).cast(pa.list_(pa.float32()))
    out = pa.table({
        "vec_id": pa.array(np.concatenate(all_ids), type=pa.int64()),
        "embedding": arr,
        "label": pa.array(np.concatenate(all_labels), type=pa.int32()),
    })
    tmp = str(dst) + ".tmp"
    pq.write_table(out, tmp)
    Path(tmp).replace(dst)
    print(f"embeddings: {n} rows (jittered copies)")


def main() -> int:
    needed = ["orders", "lineitem", "events", "documents",
              "customer", "embeddings"]
    missing = [t for t in needed if not (SRC / f"{t}.parquet").is_file()]
    if missing:
        raise SystemExit(
            f"run tools/make_sf10.py first (missing in sf10: {missing})"
        )
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    # bound duckdb's materialization memory; the unions stream to disk
    con.execute("SET memory_limit='24GB'")
    # offsets are PRE-COMPUTED literals: a `{k} * stride` expression
    # overflows DuckDB's INT32 literal arithmetic at the sf100 strides
    # scale-invariant dims for the star family (same convention as
    # make_sf10: the realistic 100x story is facts growing against
    # fixed dims); customer IS amplified below — orders carries
    # o_custkey through the stride, so the customer keys must follow
    import shutil
    for dim in ("region", "nation", "part", "supplier"):
        dst = OUT / f"{dim}.parquet"
        if not dst.is_file():
            shutil.copyfile(SRC / f"{dim}.parquet", dst)
            print(f"{dim}: copied (scale-invariant)")
    amplify_embeddings()
    plans = {
        "customer": lambda k: (
            f"c_custkey + {k * CUST_STRIDE} AS c_custkey"
        ),
        "documents": lambda k: f"doc_id + {k * DOC_STRIDE} AS doc_id",
        "events": lambda k: (
            f"event_id + {k * EVENT_STRIDE} AS event_id, "
            f"user_id + {k * USER_STRIDE} AS user_id"
        ),
        "orders": lambda k: (
            f"o_orderkey + {k * ORDER_STRIDE} AS o_orderkey, "
            f"o_custkey + {k * CUST_STRIDE} AS o_custkey"
        ),
        "lineitem": lambda k: (
            f"l_orderkey + {k * ORDER_STRIDE} AS l_orderkey"
        ),
    }
    for t, repl in plans.items():
        dst = OUT / f"{t}.parquet"
        src = SRC / f"{t}.parquet"
        if t == "lineitem":
            # ~18 GB: a single 10-way UNION COPY materializes past the
            # memory limit and thrashes — write a parquet DIRECTORY of
            # one part per copy instead (bounded memory, resumable;
            # Spark and metadata_row_count both read directories)
            dst.mkdir(parents=True, exist_ok=True)
            for k in range(COPIES):
                part = dst / f"part-{k:02d}.parquet"
                if part.is_file():
                    print(f"{t} part {k}: exists, skipping")
                    continue
                tmp = str(part) + ".tmp"
                con.execute(
                    f"COPY (SELECT * REPLACE ({repl(k)}) FROM '{src}')"
                    f" TO '{tmp}' (FORMAT PARQUET)"
                )
                Path(tmp).replace(part)
                print(f"{t} part {k}: done")
            n = con.execute(
                f"SELECT count(*) FROM '{dst}/*.parquet'"
            ).fetchone()[0]
            print(f"{t}: {n} rows")
            continue
        if dst.is_file():
            print(f"{t}: exists, skipping")
            continue
        union = " UNION ALL ".join(
            f"SELECT * REPLACE ({repl(k)}) FROM '{src}'"
            for k in range(COPIES)
        )
        tmp = str(dst) + ".tmp"
        con.execute(
            f"COPY ({union}) TO '{tmp}' (FORMAT PARQUET)"
        )
        Path(tmp).replace(dst)
        n = con.execute(
            f"SELECT count(*) FROM '{dst}'"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
