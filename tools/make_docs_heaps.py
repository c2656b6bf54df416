"""Heaps-law documents fixture (r11): documents-only scaling slices
whose VOCABULARY grows with corpus size, for measuring the banded
dedup family's third decade on a corpus that does not saturate the
MinHash signature space.

Why: the standard .scratch/sf100 documents slice is 10 key-shifted
copies of sf10, which inherits the generator's fixed 31-token
vocabulary. `tools/band_candidate_census.py` showed that freezes the
distinct band-bucket count (371,146 at BOTH sf10 and sf100) while raw
band-collision pairs grow ×108 — candidate generation goes quadratic
BY CORPUS CONSTRUCTION, so decade-3 cells there measure the fixture,
not the operator. Real corpora grow vocabulary ~∝ N^β (Heaps' law,
β ≈ 0.5); this fixture scales V with √tokens (6,000 → 19,000 across
the sf10→sf100 tier) so bucket count grows with docs and candidates
stay Θ(docs × bands).

Shape (all derived from doc ids by seeded hash expressions — fully
deterministic, pure JVM, no Python in the generation path):
- tier sizes 50k / 500k / 5M docs (sf1/sf10/sf100 scale),
- 40-69 tokens per doc; 30% of positions draw from 8 shared
  stopwords (hot mass), the rest uniform over the tier vocabulary,
- every 10th base doc has a planted near-dup partner (odd id =
  base id + 1) with ~5% of positions perturbed — Θ(docs) true pairs
  at set-2-gram jaccard ≳ 0.8, the structure the banded rows detect.

Writes .scratch/docs_heaps/sf{1,10,100}/documents.parquet
(doc_id BIGINT, text STRING, source STRING — the columns the banded
rows read). Usage: SPARK_DRIVER_MEMORY=32g python tools/make_docs_heaps.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

TIERS = {
    "sf1": (50_000, 2_000),
    "sf10": (500_000, 6_000),
    "sf100": (5_000_000, 19_000),
}
STOP = "the of and to in for on with".split()


def build(spark, n_docs: int, vocab: int):
    # ids: base docs at even ids; every 10th base doc gets a near-dup
    # partner at base_id + 1 (same hash seed stream => same tokens,
    # ~5% positions re-drawn)
    base = spark.range(n_docs).select(
        (F.col("id") * 2).alias("doc_id"),
        F.col("id").alias("__b"),
        F.lit(False).alias("__dup"),
    )
    dups = (
        spark.range(n_docs).filter(F.pmod("id", F.lit(10)) == 0)
        .select(
            (F.col("id") * 2 + 1).alias("doc_id"),
            F.col("id").alias("__b"),
            F.lit(True).alias("__dup"),
        )
    )
    ids = base.unionAll(dups)

    def h(*cols):
        return F.abs(F.xxhash64(*cols))

    ln = (h(F.col("__b"), F.lit("len")) % 30 + 40).cast("int")
    stop_arr = F.array(*[F.lit(s) for s in STOP])

    def token(pos):
        # pos is a Column (0-based position); seed stream keyed on the
        # BASE index so the dup partner re-derives identical tokens
        hp = h(F.col("__b"), F.lit("t"), pos)
        perturbed = (
            F.col("__dup")
            & (h(F.col("__b"), F.lit("x"), pos) % 20 == 0)
        )
        hq = F.when(perturbed, h(F.col("__b"), F.lit("p"), pos)
                    ).otherwise(hp)
        return F.when(
            hq % 10 < 3, F.element_at(stop_arr, (hq % 8 + 1).cast("int"))
        ).otherwise(
            F.concat(F.lit("w"), (hq % vocab).cast("string"))
        )

    text = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), ln - 1), token)
    )
    src = F.concat(F.lit("src"), (h(F.col("__b"), F.lit("s")) % 20)
                   .cast("string"))
    return ids.select(
        "doc_id", text.alias("text"), src.alias("source")
    )


def main() -> int:
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("make_docs_heaps")
    out_root = REPO / ".scratch" / "docs_heaps"
    for tier, (n, v) in TIERS.items():
        dst = out_root / tier
        if (dst / "documents.parquet").exists():
            print(f"[skip] {tier} exists", flush=True)
            continue
        t0 = time.perf_counter()
        df = build(spark, n, v)
        (df.repartition(32)
           .write.mode("overwrite")
           .parquet(str(dst / "documents.parquet")))
        print(f"[made] {tier}: {n} docs vocab~{v} "
              f"({round(time.perf_counter() - t0, 1)}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
