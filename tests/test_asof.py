"""Semantics tests for the as-of join (operators/asof.py)."""

from __future__ import annotations

import pytest

from parquet_sampler_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def pair(spark):
    left = spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (1, 5, "p0"),
         (2, 10, "q1"), (3, 10, "r1")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 7, 100.0), (1, 15, 200.0), (1, 20, 300.0), (2, 11, 400.0)],
        "k long, t long, v double",
    )
    return left, right


def _by_name(rows):
    return {r.name: r for r in rows}


def test_asof_inner_basics(pair):
    left, right = pair
    out = _by_name(asof_join(left, right, ["k"], "t", "t", ["v"],
                             how="inner").collect())
    # p1 (t=10): latest right ≤ 10 is t=7 → 100
    assert out["p1"].asof_t == 7 and out["p1"].asof_v == 100.0
    # p2 (t=20): right at exactly 20 matches (inclusive) → 300
    assert out["p2"].asof_t == 20 and out["p2"].asof_v == 300.0
    # p0 (t=5): nothing at or before → dropped in inner mode
    assert "p0" not in out
    # q1 (k=2, t=10): only right is t=11 (later) → dropped
    assert "q1" not in out
    # r1: key 3 has no right rows at all → dropped
    assert "r1" not in out


def test_asof_left_keeps_unmatched(pair):
    left, right = pair
    out = _by_name(asof_join(left, right, ["k"], "t", "t", ["v"],
                             how="left").collect())
    assert len(out) == 5
    assert out["p0"].asof_t is None and out["p0"].asof_v is None
    assert out["r1"].asof_t is None


def test_asof_right_duplicates_deterministic(spark):
    """Two right rows at the same (key, ts): the struct-ordered last one
    wins — stable across runs."""
    left = spark.createDataFrame([(1, 10, "x")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 2.0)], "k long, t long, v double"
    )
    for _ in range(3):
        out = asof_join(left, right, ["k"], "t", "t", ["v"]).collect()
        assert out[0].asof_v == 2.0  # max struct (t, v)


def test_asof_invalid_how(pair):
    left, right = pair
    with pytest.raises(ValueError):
        asof_join(left, right, ["k"], "t", "t", ["v"], how="full")


def test_null_right_timestamp_no_phantom_match(spark):
    """A right row with NULL ts must never be carried as a match
    (regression: nulls-first ordering made it a phantom payload)."""
    left = spark.createDataFrame([(1, 10, "p")], "k long, t long, name string")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k long, t long, v double"
    )
    inner = asof_join(left, right, ["k"], "t", "t", ["v"], how="inner")
    assert inner.count() == 0
    left_out = asof_join(left, right, ["k"], "t", "t", ["v"],
                         how="left").collect()
    assert left_out[0].asof_t is None and left_out[0].asof_v is None
