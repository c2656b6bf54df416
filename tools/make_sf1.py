"""Generate a LOCAL sf1 dataset (10× sf0.1) for scale-trend runs.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md; the generator
itself is not in the container), so the one-decade-further scaling
evidence VERDICT r5 asks for needs a local sf1. Only the three tables
the heavy-tail queries read are produced, into
``.scratch/sf1/`` (gitignored — derived data, ~100 MB):

* ``customer`` / ``events`` — 10 key-shifted copies of sf0.1: ids are
  offset per copy by a stride larger than the key range, so key
  cardinality grows 10× while every per-key distribution (events per
  user, session shape, mod-100 CDC update classes — the stride is a
  multiple of 100) is preserved. This is the scaling shape a 10× real
  corpus has: more keys, same per-key volume.
* ``documents`` — REGENERATED at 50k rows from the observed sf0.1
  generative family (uniform words from the same small vocab, uniform
  10–100 words/doc, empirical lang weights, uniform source), seeded.
  Key-shifted copies would be wrong here: verbatim text twins are
  exact duplicates, so every doc would gain 9 cross-copy near-dup
  partners and the pair graph would densify ~45× — an artifact, not
  scale. Regeneration keeps the natural per-doc near-dup rate (high
  chance Jaccard collisions from the 31-word vocab) so pair volume
  grows like a real 10× corpus.

Deterministic (seed 7). Usage: python tools/make_sf1.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / ".scratch" / "sf1"
SRC = "/root/testdata/sf0.1"
COPIES = 10
CUST_STRIDE = 100_000      # > max c_custkey, multiple of 100 (CDC mods)
EVENT_STRIDE = 1_000_000   # > max event_id
USER_STRIDE = 100_000      # > max user_id
N_DOCS = 50_000
SEED = 7


ORDER_STRIDE = 10_000_000  # > max o_orderkey, keeps orders↔lineitem joined


def amplify_keyed(con: duckdb.DuckDBPyConnection) -> None:
    con.execute(f"CREATE VIEW c0 AS SELECT * FROM '{SRC}/customer.parquet'")
    con.execute(f"CREATE VIEW e0 AS SELECT * FROM '{SRC}/events.parquet'")
    cust = " UNION ALL ".join(
        f"SELECT * REPLACE (c_custkey + {k * CUST_STRIDE} AS c_custkey) "
        f"FROM c0" for k in range(COPIES)
    )
    con.execute(
        f"COPY ({cust}) TO '{OUT}/customer.parquet' (FORMAT PARQUET)"
    )
    ev = " UNION ALL ".join(
        f"SELECT * REPLACE (event_id + {k * EVENT_STRIDE} AS event_id, "
        f"user_id + {k * USER_STRIDE} AS user_id) FROM e0"
        for k in range(COPIES)
    )
    con.execute(f"COPY ({ev}) TO '{OUT}/events.parquet' (FORMAT PARQUET)")


def amplify_star(con: duckdb.DuckDBPyConnection) -> None:
    """Amplify the fact chain with JOIN INTEGRITY preserved: orderkey
    and custkey shift by the same stride in every table that carries
    them, so copy k's lineitem joins copy k's orders joins copy k's
    customer — the reference workflow (sample → semijoin chain) and
    the customer/orders/lineitem TPC-H adaptations run unmodified at
    10×. part/supplier/nation/region stay verbatim (small dims; each
    part/supplier just gains 10× fan-in, the realistic shape of a
    bigger fact over the same catalog)."""
    con.execute(f"CREATE VIEW o0 AS SELECT * FROM '{SRC}/orders.parquet'")
    con.execute(
        f"CREATE VIEW l0 AS SELECT * FROM '{SRC}/lineitem.parquet'"
    )
    orders = " UNION ALL ".join(
        f"SELECT * REPLACE (o_orderkey + {k * ORDER_STRIDE} AS o_orderkey, "
        f"o_custkey + {k * CUST_STRIDE} AS o_custkey) FROM o0"
        for k in range(COPIES)
    )
    con.execute(
        f"COPY ({orders}) TO '{OUT}/orders.parquet' (FORMAT PARQUET)"
    )
    li = " UNION ALL ".join(
        f"SELECT * REPLACE (l_orderkey + {k * ORDER_STRIDE} AS l_orderkey) "
        f"FROM l0" for k in range(COPIES)
    )
    con.execute(
        f"COPY ({li}) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)"
    )
    for t in ("part", "supplier", "nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )


def regenerate_documents(con: duckdb.DuckDBPyConnection) -> None:
    vocab = [
        r[0] for r in con.execute(
            f"SELECT DISTINCT unnest(string_split(text, ' ')) "
            f"FROM '{SRC}/documents.parquet' ORDER BY 1"
        ).fetchall()
    ]
    langs = con.execute(
        f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' "
        f"GROUP BY 1 ORDER BY 1"
    ).fetchall()
    lang_names = [l for l, _ in langs]
    lang_w = np.array([c for _, c in langs], dtype=np.float64)
    lang_w /= lang_w.sum()
    sources = [
        r[0] for r in con.execute(
            f"SELECT DISTINCT source FROM '{SRC}/documents.parquet' "
            f"ORDER BY 1"
        ).fetchall()
    ]

    rng = np.random.default_rng(SEED)
    lens = rng.integers(10, 101, size=N_DOCS)
    words = np.array(vocab)
    texts = [
        " ".join(words[rng.integers(0, len(words), size=n)])
        for n in lens
    ]
    # plant near-duplicates at the rate observed in the driver data
    # (jaccard_pairs finds ~256 qualifying pairs per 5k docs at sf0.1):
    # ~5% of docs become a 1-word-substituted copy of an earlier doc, so
    # the high-Jaccard dup graph grows LINEARLY with corpus size (the
    # real-corpus shape) on top of the quadratic random-collision
    # background the 31-word vocab produces at any sf
    n_planted = N_DOCS // 20
    for i in rng.choice(
        np.arange(N_DOCS // 10, N_DOCS), size=n_planted, replace=False
    ):
        src_doc = texts[int(i) - N_DOCS // 10].split(" ")
        pos = int(rng.integers(0, len(src_doc)))
        src_doc[pos] = str(words[int(rng.integers(0, len(words)))])
        texts[int(i)] = " ".join(src_doc)
    doc_lang = rng.choice(lang_names, size=N_DOCS, p=lang_w)
    doc_src = rng.choice(sources, size=N_DOCS)

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "doc_id": pa.array(range(N_DOCS), type=pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(doc_lang.tolist()),
        "source": pa.array(doc_src.tolist()),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    })
    pq.write_table(tbl, OUT / "documents.parquet")


def amplify_embeddings() -> None:
    """10 vec_id-shifted copies of the embeddings table, each copy's
    vectors perturbed by small seeded Gaussian jitter (σ=0.02 per
    component before renormalization is NOT applied — the raw vectors
    are stored, as in the source data). Verbatim copies would plant 9
    exact twins per vector — every near-dup/ANN query would measure an
    artifact, not scale; the jitter keeps cross-copy cosines ≈ 0.999…
    only for a vector and its own jittered copies at far-apart ids,
    while the bulk pairwise-cosine distribution (mass in [0.4, 0.52])
    is preserved. For scale-TREND timing only; oracle parity runs stay
    on the driver data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    vec_ids = np.array(t.column("vec_id").to_pylist(), dtype=np.int64)
    labels = np.array(t.column("label").to_pylist())
    rng = np.random.default_rng(SEED + 1)
    n, dim = vecs.shape
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
        # list-of-ndarray: pyarrow ingests the float32 buffers directly,
        # no per-element Python-object round trip
        "embedding": pa.array(
            list(np.concatenate(all_vecs)), type=pa.list_(pa.float32())
        ),
        "label": pa.array(np.concatenate(all_labels).tolist(),
                          type=pa.int32()),
    })
    pq.write_table(out, OUT / "embeddings.parquet")


def main() -> int:
    OUT.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    amplify_keyed(con)
    amplify_star(con)
    regenerate_documents(con)
    amplify_embeddings()
    for t in ("customer", "events", "documents", "embeddings",
              "orders", "lineitem"):
        n = con.execute(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'"
        ).fetchone()[0]
        print(f"{t}: {n} rows -> {OUT}/{t}.parquet")
    return 0


if __name__ == "__main__":
    sys.exit(main())
