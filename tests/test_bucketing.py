"""Bucketed-join tests: the join of two co-bucketed tables must plan
without any Exchange (the shuffle happened at write time)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.sources.bucketing import (
    cobucketed_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static conf — tables land in the session default
    # (spark-warehouse/, gitignored) and are dropped on teardown
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    write_bucketed(o, "o_b", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    yield "li_b", "o_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the shuffle-free property is actually exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucketed_join(spark, lt, rt, "l_orderkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_cobucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    j = cobucketed_join(spark, lt, rt, "l_orderkey")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    want = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    assert j.count() == want


def test_bucketed_agg_no_exchange(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = (
        spark.table(lt).groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
