"""Snapshot diff classification: added/deleted/changed, null-safe
payload comparison, and input validation."""

from __future__ import annotations

import pytest

from parquet_sampler_spark.operators.diff import snapshot_diff

SCHEMA = "k long, a string, b double"


@pytest.fixture(scope="module")
def old(spark):
    return spark.createDataFrame(
        [(1, "x", 1.0), (2, "y", None), (3, None, 3.0), (4, "w", 4.0)],
        SCHEMA,
    )


def test_classification(spark, old):
    new = spark.createDataFrame(
        [
            (1, "x", 1.0),     # unchanged -> dropped
            (2, "y", None),    # unchanged incl. NULL payload field
            (3, None, 99.0),   # changed (NULL vs non-NULL elsewhere)
            # 4 deleted
            (5, "new", 5.0),   # added
        ],
        SCHEMA,
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {3: "changed", 4: "deleted", 5: "added"}


def test_null_to_null_is_unchanged(spark):
    o = spark.createDataFrame([(1, None, None)], SCHEMA)
    n = spark.createDataFrame([(1, None, None)], SCHEMA)
    assert snapshot_diff(o, n, ["k"]).count() == 0


def test_duplicate_keys_rejected(spark, old):
    dup = spark.createDataFrame([(1, "x", 1.0), (1, "x", 2.0)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        snapshot_diff(old, dup, ["k"])


def test_schema_mismatch_rejected(spark, old):
    other = old.withColumnRenamed("b", "c")
    with pytest.raises(ValueError, match="share a schema"):
        snapshot_diff(old, other, ["k"])


def test_missing_key_rejected(spark, old):
    with pytest.raises(ValueError, match="key columns"):
        snapshot_diff(old, old, ["nope"])


def test_composite_key(spark):
    o = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b")], "k1 long, k2 long, v string"
    )
    n = spark.createDataFrame(
        [(1, 1, "a"), (1, 3, "c")], "k1 long, k2 long, v string"
    )
    got = {
        (r.k1, r.k2): r.change_type
        for r in snapshot_diff(o, n, ["k1", "k2"]).collect()
    }
    assert got == {(1, 2): "deleted", (1, 3): "added"}
