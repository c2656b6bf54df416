"""MERGE (upsert/delete) semantics tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.operators.merge import merge_upsert


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )


def test_update_insert_delete(spark, base):
    updates = spark.createDataFrame(
        [(2, "b2", 22.0, False),   # update
         (4, "d", 40.0, False),    # insert
         (3, None, None, True)],   # delete
        "k long, name string, v double, is_deleted boolean",
    )
    out = {r.k: (r.name, r.v)
           for r in merge_upsert(base, updates, ["k"],
                                 delete_col="is_deleted").collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 22.0), 4: ("d", 40.0)}


def test_upsert_without_deletes(spark, base):
    updates = spark.createDataFrame(
        [(1, "a9", 99.0)], "k long, name string, v double"
    )
    out = merge_upsert(base, updates, ["k"])
    assert out.count() == 3
    assert out.filter("k = 1").collect()[0].name == "a9"


def test_duplicate_update_keys_rejected(spark, base):
    updates = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "k long, name string, v double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(base, updates, ["k"])


def test_missing_key_rejected(spark, base):
    updates = spark.createDataFrame([(1, "x")], "other long, name string")
    with pytest.raises(ValueError, match="missing"):
        merge_upsert(base, updates, ["k"])


def test_idempotent_reapply(spark, base):
    """Re-applying the same CDC batch is a no-op — the property that
    makes retry-safe pipelines."""
    updates = spark.createDataFrame(
        [(2, "b2", 22.0)], "k long, name string, v double"
    )
    once = merge_upsert(base, updates, ["k"])
    twice = merge_upsert(once, updates, ["k"])
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))


def test_validation_skippable(spark, base):
    """validate_unique_keys=False skips the eager dup-key jobs; with a
    clean update set the result is identical to the validated path."""
    updates = base.filter(F.col("k") <= 2).withColumn(
        "v", F.col("v") + 1.0
    )
    a = merge_upsert(base, updates, ["k"]).collect()
    b = merge_upsert(base, updates, ["k"],
                     validate_unique_keys=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
