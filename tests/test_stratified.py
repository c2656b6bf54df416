"""Tests for exact per-stratum sampling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.operators.sample import sample_stratified

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_exact_count_per_stratum(orders):
    s = sample_stratified(orders, 0.02, ["o_orderpriority"], seed=3,
                          key_cols=["o_orderkey"])
    want = {
        r.o_orderpriority: math.floor(r["count"] * 0.02)
        for r in orders.groupBy("o_orderpriority").count().collect()
    }
    got = {
        r.o_orderpriority: r["count"]
        for r in s.groupBy("o_orderpriority").count().collect()
    }
    assert got == {k: v for k, v in want.items() if v > 0}


def test_deterministic(orders):
    a = sorted(r.o_orderkey for r in
               sample_stratified(orders, 0.01, ["o_orderpriority"], seed=5,
                                 key_cols=["o_orderkey"]).collect())
    b = sorted(r.o_orderkey for r in
               sample_stratified(orders, 0.01, ["o_orderpriority"], seed=5,
                                 key_cols=["o_orderkey"]).collect())
    assert a == b and len(a) > 0


def test_small_strata_not_lost_above_threshold(spark):
    """A stratum with 1/ratio rows keeps exactly 1 row; smaller strata
    floor to 0 (documented floor semantics)."""
    df = spark.createDataFrame(
        [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(10)],
        "k long, g string",
    )
    s = sample_stratified(df, 0.1, ["g"], seed=1, key_cols=["k"])
    counts = {r.g: r["count"] for r in s.groupBy("g").count().collect()}
    assert counts == {"big": 10, "small": 1}


def test_ratio_validation(orders):
    with pytest.raises(ValueError):
        sample_stratified(orders, 1.2, ["o_orderpriority"], seed=1,
                          key_cols=["o_orderkey"])
    with pytest.raises(ValueError):
        sample_stratified(orders, 0.1, ["o_orderpriority"], seed=1)
