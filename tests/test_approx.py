"""Approximate-aggregate sanity: HLL distinct counts and approximate
quantiles within documented error bounds of exact values (approximate
results can't be oracle-hashed — bounds are their contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_error_bound(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3×rsd safety margin


def test_percentile_approx_vs_exact(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    exact = o.selectExpr(
        "percentile(o_totalprice, 0.5) AS m"
    ).collect()[0].m
    approx = o.selectExpr(
        "percentile_approx(o_totalprice, 0.5, 10000) AS m"
    ).collect()[0].m
    assert abs(approx - exact) / exact < 0.01


def test_group_quantiles_matches_sql_percentile(spark):
    """applyInPandas grouped quantiles == Spark SQL exact percentile,
    bit for bit (same linear interpolation)."""
    from parquet_sampler_spark.functions.grouped import group_quantiles

    c = spark.read.parquet(f"{SF}/customer.parquet")
    got = {r.c_mktsegment: (r.q_25, r.q_50, r.q_75, r.n)
           for r in group_quantiles(c, ["c_mktsegment"], "c_acctbal")
           .collect()}
    want = {r.c_mktsegment: (r.q_25, r.q_50, r.q_75, r.n)
            for r in c.groupBy("c_mktsegment").agg(
                F.expr("percentile(c_acctbal, 0.25)").alias("q_25"),
                F.expr("percentile(c_acctbal, 0.5)").alias("q_50"),
                F.expr("percentile(c_acctbal, 0.75)").alias("q_75"),
                F.count(F.lit(1)).alias("n"),
            ).collect()}
    assert got == want


def test_group_quantiles_null_handling(spark):
    """NULLs are ignored like SQL aggregates; all-NULL groups yield NULL
    quantiles with n=0 (regression: NaN poisoning)."""
    from parquet_sampler_spark.functions.grouped import group_quantiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("b", None)],
        "g string, v double",
    )
    got = {r.g: (r.q_50, r.n)
           for r in group_quantiles(df, ["g"], "v", probs=(0.5,))
           .collect()}
    assert got["a"] == (1.5, 2)
    assert got["b"] == (None, 0)


def test_group_quantiles_name_formatting(spark):
    from parquet_sampler_spark.functions.grouped import group_quantiles

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    out = group_quantiles(df, ["g"], "v", probs=(0.07, 0.5))
    assert "q_7" in out.columns and "q_50" in out.columns
