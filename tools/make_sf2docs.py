"""Generate a 2x-sf1 documents table (100k docs) for the edit-distance
cap-crossing measurement (VERDICT r06 task 7).

At sf1 (50k docs) `edit_distance_pairs` sits just BELOW its per-block
comparison cap (`_EDIT_BLOCK_CAP` = 64; ~40 docs per (lang, tok1,
len-bucket) block), so the measured alpha 1.17 is the pre-cap
quadratic knee. One more doubling pushes the typical block past the
cap, after which per-block work saturates at cap^2 and the growth
exponent must fall back toward linear-in-#blocks — this dataset
provides that step. Reuses make_sf1's seeded document generator
verbatim (same vocab, lengths, lang weights, planting rate) at
N_DOCS=100_000 into ``.scratch/sf2docs/``; the other nine tables are
symlinked from ``.scratch/sf1`` so any (spark, sf_dir) query runs
unmodified.

Usage: python tools/make_sf2docs.py  (after tools/make_sf1.py)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import make_sf1  # noqa: E402  (sibling tool, path injected above)

OUT = REPO / ".scratch" / "sf2docs"
SF1 = REPO / ".scratch" / "sf1"


def main() -> int:
    if not (SF1 / "documents.parquet").is_file():
        raise SystemExit("run tools/make_sf1.py first")
    OUT.mkdir(parents=True, exist_ok=True)
    # same generator, doubled corpus, distinct seed stream (seed+10 so
    # the first 50k docs are NOT a verbatim prefix of sf1 — a shared
    # prefix would make the delta pure-appended, which is not how a
    # bigger corpus mixes)
    make_sf1.N_DOCS = 100_000
    make_sf1.SEED = make_sf1.SEED + 10
    make_sf1.OUT = OUT
    con = duckdb.connect()
    make_sf1.regenerate_documents(con)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        dst = OUT / f"{t}.parquet"
        if not dst.exists():
            os.symlink(SF1 / f"{t}.parquet", dst)
    n = con.execute(
        f"SELECT count(*) FROM '{OUT}/documents.parquet'"
    ).fetchone()[0]
    print(f"documents: {n} rows -> {OUT}/documents.parquet")
    return 0


if __name__ == "__main__":
    sys.exit(main())
