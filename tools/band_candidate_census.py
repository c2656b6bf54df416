"""Band-collision candidate census (r11): how many candidate pairs the
32/8 banding emits at each sf, for the SET shingling used by
minhash_pairs (distinct word 2-grams, `_JACCARD_N = 2`) vs the
WEIGHTED bigram multiset shingling (`minhash_pairs_weighted*`) — the
diagnostic behind the sf100 decade-3 findings: a banding whose corpus
background enters the s-curve emits near-quadratic candidates
regardless of how the verify stage is engineered, and the candidate
count (not the verify plan) is then the scale limiter.

Counts are computed per-bucket (k·(k−1)/2 summed) so no pair list is
ever materialized — the census itself stays Θ(docs × bands).

Usage: SPARK_DRIVER_MEMORY=32g python tools/band_candidate_census.py
"""
from __future__ import annotations

import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def census(spark, sf_dir, n, weighted):
    from parquet_sampler_spark.functions.text import word_ngrams
    from parquet_sampler_spark.operators.dedup import (
        _MINHASH_P,
        _word_ngrams,
    )

    num_hashes, bands, seed = 32, 8, 42
    r = num_hashes // bands
    rng = random.Random(seed)
    A = [rng.randrange(1, _MINHASH_P) for _ in range(num_hashes)]
    B = [rng.randrange(0, _MINHASH_P) for _ in range(num_hashes)]
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if weighted:
        ex0 = df.select(
            "doc_id",
            F.posexplode(
                word_ngrams("text", n, distinct=False)
            ).alias("p", "g"),
        )
        w = Window.partitionBy("doc_id", "g").orderBy("p")
        ex = ex0.select(
            "doc_id",
            F.concat("g", F.lit("#"),
                     (F.row_number().over(w) - 1).cast("string")
                     ).alias("s"),
        )
    else:
        ex = df.select(
            "doc_id", F.explode(_word_ngrams("text", n)).alias("s")
        )
    h = ex.select(
        "doc_id", F.abs(F.xxhash64("s") % F.lit(_MINHASH_P)).alias("h")
    )
    sig = h.groupBy("doc_id").agg(*[
        F.min(F.pmod(F.col("h") * F.lit(A[i]) + F.lit(B[i]),
                     F.lit(_MINHASH_P))).alias(f"m{i}")
        for i in range(num_hashes)
    ])
    keys = [F.xxhash64(*[F.col(f"m{j * r + i}") for i in range(r)])
            for j in range(bands)]
    banded = sig.select(
        "doc_id", F.posexplode(F.array(*keys)).alias("band", "bh")
    )
    per_bucket = banded.groupBy("band", "bh").agg(
        F.count(F.lit(1)).alias("k")
    )
    return per_bucket.agg(
        F.sum(F.expr("k * (k - 1) DIV 2")).alias("raw_pairs"),
        F.max("k").alias("hottest_bucket"),
        F.count(F.lit(1)).alias("buckets"),
    ).first()


def main() -> int:
    from parquet_sampler_spark.session import get_spark

    spark = get_spark("band_census")
    for sf in ("10", "100"):
        sf_dir = str(REPO / ".scratch" / f"sf{sf}")
        for label, n, wtd in (("set-2gram", 2, False),
                              ("weighted-bigram", 2, True)):
            t0 = time.perf_counter()
            row = census(spark, sf_dir, n, wtd)
            print(f"[census] sf{sf} {label}: raw_band_pairs="
                  f"{row['raw_pairs']} hottest_bucket="
                  f"{row['hottest_bucket']} buckets={row['buckets']} "
                  f"({round(time.perf_counter() - t0, 1)}s)",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
