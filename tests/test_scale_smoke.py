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
