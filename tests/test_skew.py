"""Salted-join equivalence tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.plans.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 1 (hot key), the rest spread over 100 keys
    big = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, 1).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(100)], "k long, name string"
    )
    return big, small


def test_inner_matches_plain_join(skewed):
    big, small = skewed
    plain = big.join(small, "k", "inner")
    salted = salted_join(big, small, "k", salt=8)
    assert salted.count() == plain.count()
    assert (sorted(map(tuple, salted.collect()))
            == sorted(map(tuple, plain.collect())))


def test_left_keeps_unmatched(skewed):
    big, small = skewed
    big2 = big.union(big.sparkSession.createDataFrame(
        [(999, -1)], "k long, payload long"))
    plain = big2.join(small, "k", "left")
    salted = salted_join(big2, small, "k", salt=8, how="left")
    assert salted.count() == plain.count()
    assert salted.filter(F.col("k") == 999).collect()[0].name is None


def test_rejects_unsupported_how(skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="full")
