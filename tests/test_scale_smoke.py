"""Scale smoke: the sampler's prefilter path at 50M rows.

Not a micro-benchmark — a structural check that at real row counts
(a) the closed-form prefilter engages, (b) the candidate set stays
~k·margin (the property that bounds the top-k sort at 100 TB), and
(c) the result is still exactly k rows.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from parquet_sampler_spark.functions.hashing import MODULUS, lehmer_hash
from parquet_sampler_spark.operators.sample import (
    _MARGIN,
    sample_exact,
)


def test_prefilter_at_50m_rows(spark):
    n, ratio = 50_000_000, 0.0001  # k = 5000
    df = spark.range(n).withColumnRenamed("id", "k")
    s = sample_exact(df, ratio, seed=99, key_cols=["k"], total_rows=n)
    k = math.floor(n * ratio)
    assert s.count() == k

    # candidate-set size: the scan-side filter keeps ~k·margin rows
    threshold = int(MODULUS * ratio * _MARGIN) + 1
    cand = df.withColumn("pr", lehmer_hash(["k"], 99)) \
             .filter(F.col("pr") < threshold).count()
    assert k <= cand < 3 * k, cand


def test_50m_sample_deterministic_slice(spark):
    """Same seed ⇒ same sample, even at this scale (first 5 keys by
    value compared across two runs)."""
    n, ratio = 50_000_000, 0.00002  # k = 1000
    df = spark.range(n).withColumnRenamed("id", "k")
    a = sample_exact(df, ratio, seed=7, key_cols=["k"], total_rows=n) \
        .orderBy("k").limit(5).collect()
    b = sample_exact(df, ratio, seed=7, key_cols=["k"], total_rows=n) \
        .orderBy("k").limit(5).collect()
    assert a == b


def test_semijoin_at_50m_rows(spark):
    """Broadcast semi-join over a 50M-row probe: BroadcastHashJoin plan
    (zero probe shuffle) + correct reduction arithmetic."""
    from parquet_sampler_spark.operators.sample import sample_exact
    from parquet_sampler_spark.operators.semijoin import semi_join_reduce

    n = 50_000_000
    probe = spark.range(n).select(
        (F.col("id") % 1_000_000).alias("k"), F.col("id").alias("payload")
    )
    build_src = spark.range(1_000_000).withColumnRenamed("id", "k")
    build = sample_exact(build_src, 0.001, seed=3, key_cols=["k"],
                         total_rows=1_000_000)  # 1000 distinct keys
    red = semi_join_reduce(probe, "k", build, "k")
    plan = red._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # each of the 1000 sampled keys appears exactly 50 times in probe
    assert red.count() == 1000 * 50


def test_block_neardup_at_200k_vectors(spark):
    """Structural check for the block-GEMM near-dup join at a row count
    where the all-pairs HOF formulation is hopeless (200k vectors =
    2·10^10 candidate dot products): the block grid must finish and
    find exactly the planted duplicates. Uses 8-dim vectors to keep
    GEMM flops bounded; the plan shape is dimension-independent."""
    from parquet_sampler_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    n = 200_000
    # deterministic pseudo-random 8-dim vectors from the row id; rows i
    # and i+n (i < 5) are exact duplicates planted across blocks
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.pmod(F.xxhash64(F.col("id") * F.lit(j + 1)), F.lit(1000))
             .cast("double") / 500.0 - 1.0).cast("float")
            for j in range(8)
        ]).alias("embedding"),
    )
    dups = base.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding"
    )
    df = base.unionByName(dups)
    got = {(r.id_a, r.id_b)
           for r in embedding_neardup_pairs(
               df, "vec_id", "embedding", threshold=0.999999,
               method="block", nblocks=32).collect()}
    assert {(i, i + n) for i in range(5)} <= got
    # 8-dim random vectors can collide at cos~1 by chance, but every
    # emitted pair must genuinely clear the threshold (verify is exact)
    assert len(got) < 100


def test_assign_splits_at_10m_rows(spark):
    """Split proportions and disjointness at 10M rows — one map pass,
    no shuffle, no driver state."""
    from parquet_sampler_spark.operators.sample import assign_splits

    df = spark.range(10_000_000).withColumnRenamed("id", "k")
    counts = {r.split: r.n for r in
              assign_splits(df, ["k"], seed=11)
              .groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert n == 10_000_000
    assert abs(counts["train"] / n - 0.8) < 0.002
    assert abs(counts["val"] / n - 0.1) < 0.002
    assert abs(counts["test"] / n - 0.1) < 0.002
