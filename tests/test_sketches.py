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
