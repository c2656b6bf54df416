"""Sketch support: HyperLogLog sketch aggregates (buildable, mergeable,
estimable — the re-aggregatable distinct-count pattern) and Count-Min
frequency sketches. Sketch binaries are engine-specific, so these are
pytest-validated against exact answers rather than oracle-hashed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_hll_sketch_estimate_accuracy(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    est = li.select(
        F.hll_sketch_estimate(
            F.hll_sketch_agg("l_orderkey")
        ).alias("est")
    ).collect()[0].est
    assert abs(est - exact) / exact < 0.05


def test_hll_sketches_merge_across_partitions(spark):
    """The re-aggregation property: per-group sketches union into the
    global sketch — the pattern that makes distinct counts rollup-able
    without re-scanning (impossible with plain countDistinct)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_orderkey").alias("sk")
    )
    merged = per_flag.select(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0].est
    assert abs(merged - exact) / exact < 0.05


def test_count_min_sketch_frequencies(spark):
    """CMS point queries overestimate by at most eps·N with the chosen
    confidence; never underestimate."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    n = li.count()
    exact = {r.l_returnflag: r["count"]
             for r in li.groupBy("l_returnflag").count().collect()}
    sk_bytes = li.select(
        F.count_min_sketch(
            "l_returnflag", F.lit(0.005), F.lit(0.99), F.lit(42)
        ).alias("sk")
    ).collect()[0].sk

    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(sk_bytes))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    for flag, cnt in exact.items():
        est = cms.estimateCount(flag)
        assert cnt <= est <= cnt + 0.005 * n * 2, (flag, cnt, est)


def test_heavy_hitters_exact_and_adversarial_spread(spark):
    """The candidates-then-verify heavy hitter plan must return the
    exact HAVING-threshold answer even when a globally-heavy key is
    spread so thinly that no partition sees it concentrated — the case
    a naive 'locally heavy somewhere' intuition worries about, and
    which the pigeonhole bound actually covers."""
    from parquet_sampler_spark.operators.sketches import heavy_hitters

    k = 10
    # 1000 rows in 10 partitions: key "hot" has 150 occurrences spread
    # exactly evenly (15 per partition, partition size 100 -> 15*10 >
    # 100 holds, locally heavy); key "warm" has 101 > 1000/10 spread
    # 10/11 per partition (10*10 > 100 is FALSE in most partitions but
    # 11*10 > 100 in one -> still proposed); "cold" keys fill the rest.
    rows = []
    for p in range(10):
        rows += [("hot",)] * 15
        rows += [("warm",)] * (11 if p == 0 else 10)
        rows += [(f"cold_{p}_{i}",) for i in range(100 - 15 - (11 if p == 0 else 10))]
    # parallelize with explicit slices preserves the crafted layout
    # (repartition would rehash it away)
    rdd = spark.sparkContext.parallelize(rows, 10)
    df = spark.createDataFrame(rdd, "term string")
    assert df.rdd.getNumPartitions() == 10
    got = {r.term: r.cnt for r in heavy_hitters(df, "term", k).collect()}
    n = len(rows)
    assert got == {"hot": 150, "warm": 101}
    assert all(c * k > n for c in got.values())


def test_heavy_hitters_threshold_strictness(spark):
    """A key at EXACTLY n/k must be excluded (strict >), and NULLs are
    ignored rather than counted as a key."""
    from parquet_sampler_spark.operators.sketches import heavy_hitters

    # n = 100 non-null rows, k = 4 -> threshold 25: "edge" has exactly
    # 25 (excluded), "over" has 26 (included)
    rows = [("edge",)] * 25 + [("over",)] * 26 + [
        (f"c{i}",) for i in range(49)
    ] + [(None,)] * 7
    df = spark.createDataFrame(rows, "term string").repartition(3)
    got = {r.term: r.cnt for r in heavy_hitters(df, "term", 4).collect()}
    assert got == {"over": 26}


def test_heavy_hitters_validates_k(spark):
    from parquet_sampler_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([("a",)], "term string")
    with pytest.raises(ValueError, match="k >= 2"):
        heavy_hitters(df, "term", 1)


def test_heavy_hitters_mg_summary_is_bounded(spark):
    """The per-partition summary is Misra-Gries: at most k-1 counters
    regardless of the partition's distinct-key count — the property
    that keeps 100TB-scale token streams in O(k) worker memory — and
    the heavy key still survives the decrements."""
    from parquet_sampler_spark.operators.sketches import (
        _mg_update,
        heavy_hitters,
    )

    # unit: stream 10k distinct singletons + a heavy key through one
    # summary; the dict never exceeds k-1 entries and the heavy key
    # is present at the end
    counters = {}
    k = 10
    for i in range(10_000):
        _mg_update(counters, f"cold_{i}", 1, k - 1)
        assert len(counters) <= k - 1
        if i % 3 == 0:
            _mg_update(counters, "hot", 1, k - 1)
    assert "hot" in counters

    # end-to-end: single partition, 5k distinct cold keys, one value
    # above the 1/4 threshold
    rows = [("hot",)] * 2000 + [(f"c{i}",) for i in range(5000)]
    rdd = spark.sparkContext.parallelize(rows, 1)
    df = spark.createDataFrame(rdd, "term string")
    got = {r.term: r.cnt for r in heavy_hitters(df, "term", 4).collect()}
    assert got == {"hot": 2000}


def test_heavy_hitters_float_nan_key(spark):
    """A globally-heavy float NaN must be reported with its exact
    count (ADVICE r06): Spark's isNotNull keeps NaN, so it counts
    toward n and must be proposable as a candidate. The sketch phase
    canonicalizes NaN (distinct NaN objects compare unequal, which
    would otherwise fragment its counters) and ships its candidacy on
    a dedicated marker row because object-dtype pandas -> Arrow maps
    NaN to null; the verify phase rides Spark's NaN-equality
    join/groupBy semantics."""
    from parquet_sampler_spark.operators.sketches import heavy_hitters

    nan = float("nan")
    # n = 100 non-null rows (NULLs excluded, NaN included), k = 4 ->
    # threshold 25: NaN (50) and 1.0 (30) qualify, the rest don't
    rows = (
        [(nan,)] * 50 + [(1.0,)] * 30 + [(2.0,)] * 5 + [(3.0,)] * 5
        + [(4.0,)] * 10 + [(None,)] * 40
    )
    df = spark.createDataFrame(rows, "v double").repartition(4)
    got = {
        ("nan" if r.v != r.v else r.v): r.cnt
        for r in heavy_hitters(df, "v", 4).collect()
    }
    assert got == {"nan": 50, 1.0: 30}

    # below-threshold NaN must NOT appear (the threshold stays exact)
    rows2 = [(nan,)] * 10 + [(1.0,)] * 90
    df2 = spark.createDataFrame(rows2, "v double").repartition(4)
    got2 = {r.v: r.cnt for r in heavy_hitters(df2, "v", 4).collect()}
    assert got2 == {1.0: 90}


def test_quantile_summaries_lossless_under_cap(spark):
    """n <= cap keeps every value at weight 1: the merged estimate is
    the exact left-continuous weighted quantile of the raw data."""
    from parquet_sampler_spark.operators.sketches import (
        merged_quantiles,
        quantile_summaries,
    )

    rows = [("a", d, float(v)) for d in range(3) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, sub int, v double")
    summ = quantile_summaries(df, ["g"], ["sub"], "v", cap=512)
    got = merged_quantiles(summ, ["g"], [0.5, 0.9]).collect()[0]
    # 300 values = 3 copies of 0..99; p-quantile by weighted rank
    # (left-continuous searchsorted) lands on the observed value 49/89
    assert got.q50 == 49.0 and got.q90 == 89.0


def test_quantile_summaries_rank_error_bounded(spark):
    """Under real compression (n >> cap) the merged estimate's exact
    rank stays within 1/(2*cap) per contributing partition — checked
    here with a 20x-over-cap skewed group at a 1% envelope."""
    import numpy as np

    from parquet_sampler_spark.operators.sketches import (
        merged_quantiles,
        quantile_summaries,
    )

    rng = np.random.default_rng(11)
    vals = np.concatenate([
        rng.exponential(10.0, size=5000) + 100 * d for d in range(4)
    ])
    rows = [("g", int(i // 5000), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, sub int, v double") \
        .repartition(8)
    summ = quantile_summaries(df, ["g"], ["sub"], "v", cap=256)
    # every (g, sub) summary is capped: 5000 > 256
    assert all(len(r.vals) == 256 for r in summ.collect())
    est = merged_quantiles(summ, ["g"], [0.5, 0.9]).collect()[0]
    s = np.sort(vals)
    for p, v in ((0.5, est.q50), (0.9, est.q90)):
        rank = np.searchsorted(s, v, side="right") / len(s)
        assert abs(rank - p) <= 0.01, (p, v, rank)


def test_quantile_summaries_hot_bucket_partition_local(spark):
    """The 100 TB memory contract (VERDICT r07 #1): ONE deliberately
    hot (group, sub) bucket spread over many partitions must be built
    partition-locally — the phase-1 mapInPandas emits one bounded
    summary per partition (never a single executor-resident sort of
    the whole bucket) — and the merged estimate still meets the same
    rank-error envelope as the single-level build."""
    import numpy as np

    from parquet_sampler_spark.operators.sketches import (
        _partition_quantile_summaries,
        merged_quantiles,
        quantile_summaries,
    )

    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.5, size=60_000)  # skewed, one bucket
    rows = [("hot", 0, float(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, sub int, v double") \
        .repartition(16)

    cap = 128
    part = _partition_quantile_summaries(df, ["g"], ["sub"], "v", cap)
    prows = part.collect()
    # partition-locality: one bounded summary PER PARTITION of the hot
    # bucket, not one giant one — and every summary obeys the cap
    assert len(prows) == 16, len(prows)
    assert all(len(r.vals) <= cap for r in prows)
    # total shuffled volume is summaries, not raw rows
    assert sum(len(r.vals) for r in prows) <= 16 * cap

    summ = quantile_summaries(df, ["g"], ["sub"], "v", cap=cap)
    srows = summ.collect()
    assert len(srows) == 1 and len(srows[0].vals) == cap
    est = merged_quantiles(summ, ["g"], [0.5, 0.9]).collect()[0]
    s = np.sort(vals)
    for p, v in ((0.5, est.q50), (0.9, est.q90)):
        lo = np.searchsorted(s, v, side="left") / len(s)
        hi = np.searchsorted(s, v, side="right") / len(s)
        # two-level build: O(log(n)/cap) — 1% envelope at cap 128
        assert lo - 0.01 <= p <= hi + 0.01, (p, v, lo, hi)


def test_quantile_summaries_validation(spark):
    from parquet_sampler_spark.operators.sketches import (
        merged_quantiles,
        quantile_summaries,
    )

    df = spark.createDataFrame([("a", 1, 1.0)], "g string, s int, v double")
    import pytest as _pt

    with _pt.raises(ValueError, match="cap >= 2"):
        quantile_summaries(df, ["g"], ["s"], "v", cap=1)
    summ = quantile_summaries(df, ["g"], ["s"], "v")
    with _pt.raises(ValueError, match="within"):
        merged_quantiles(summ, ["g"], [1.5])


def test_mg_weighted_updates_bounded_and_exact_n(spark):
    """The partition-local weighted MG pass (the streaming frequency
    maintainer's per-batch update path) ships at most k rows per
    partition no matter how many distinct keys a partition holds, the
    marker-carried n is EXACT, the updates are key-sorted (fold
    determinism), and folding them recovers every truly-heavy key."""
    from parquet_sampler_spark.operators.sketches import (
        _mg_update,
        mg_weighted_updates,
    )

    k = 6
    # 4 partitions × 3000 distinct singleton keys + a spread hot key:
    # exact per-partition groupBy would ship ~12k rows; MG ships ≤ k·4
    rows = []
    for p in range(4):
        rows += [(f"p{p}u{i}",) for i in range(3000)]
        rows += [("hot",)] * 900
    df = spark.createDataFrame(rows, "term string").repartition(4)

    updates, n = mg_weighted_updates(df, "term", k)
    assert n == df.count()  # marker rows carry the exact count
    assert len(updates) <= (k - 1) * df.rdd.getNumPartitions()
    assert updates == sorted(updates)  # deterministic fold order

    counters: dict = {}
    for key, c in updates:
        assert c > 0
        _mg_update(counters, key, c, k - 1)
    # "hot" is 3600/15600 = 23% > 1/6 — must survive the merged fold
    assert "hot" in counters

    with pytest.raises(ValueError):
        mg_weighted_updates(df, "term", 1)
