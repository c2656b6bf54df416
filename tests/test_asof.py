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


def _mk(spark, lrows, rrows):
    l = spark.createDataFrame(lrows, "k int, ts bigint, lid int")
    r = spark.createDataFrame(rrows, "k int, ts bigint, rid int")
    return l, r


def _run(spark, lrows, rrows, **kw):
    l, r = _mk(spark, lrows, rrows)
    out = asof_join(l, r, ["k"], "ts", "ts", ["rid"], **kw)
    return {row["lid"]: (row["asof_ts"], row["asof_rid"])
            for row in out.collect()}


def test_forward_picks_earliest_at_or_after(spark):
    got = _run(spark,
               [(1, 100, 1), (1, 250, 2)],
               [(1, 50, 10), (1, 150, 11), (1, 300, 12)],
               direction="forward", how="left")
    assert got[1] == (150, 11)
    assert got[2] == (300, 12)


def test_forward_inclusive_at_equal_ts(spark):
    got = _run(spark, [(1, 100, 1)], [(1, 100, 10), (1, 120, 11)],
               direction="forward")
    assert got[1] == (100, 10)


def test_nearest_picks_closer_side_and_ties_backward(spark):
    got = _run(spark,
               [(1, 100, 1), (1, 200, 2), (1, 305, 3)],
               [(1, 90, 10), (1, 150, 11), (1, 250, 12), (1, 360, 13)],
               direction="nearest", how="left")
    assert got[1] == (90, 10)    # back dist 10 < fwd dist 50
    assert got[2] == (150, 11)   # tie (50 vs 50) -> backward
    assert got[3] == (250, 12)   # back 55 < fwd 55? 305-250=55, 360-305=55 tie -> backward


def test_nearest_one_sided_when_no_other_candidate(spark):
    got = _run(spark, [(1, 10, 1), (1, 500, 2)],
               [(1, 100, 10)], direction="nearest")
    assert got[1] == (100, 10)  # only forward exists
    assert got[2] == (100, 10)  # only backward exists


def test_tolerance_voids_far_matches(spark):
    got = _run(spark,
               [(1, 100, 1), (1, 400, 2)],
               [(1, 90, 10), (1, 200, 11)],
               direction="nearest", how="left", tolerance=50)
    assert got[1] == (90, 10)
    assert got[2] == (None, None)  # nearest is 200, dist 200 > 50
    inner = _run(spark,
                 [(1, 100, 1), (1, 400, 2)],
                 [(1, 90, 10), (1, 200, 11)],
                 direction="nearest", how="inner", tolerance=50)
    assert set(inner) == {1}


def test_duplicate_right_tie_rules(spark):
    # two right rows at the same ts: backward takes the LARGEST
    # (ts, rid) struct, forward the SMALLEST
    rrows = [(1, 100, 10), (1, 100, 11)]
    back = _run(spark, [(1, 150, 1)], rrows, direction="backward")
    fwd = _run(spark, [(1, 50, 1)], rrows, direction="forward")
    assert back[1] == (100, 11)
    assert fwd[1] == (100, 10)


def test_bad_direction_raises(spark):
    l, r = _mk(spark, [(1, 1, 1)], [(1, 1, 1)])
    import pytest as _pt

    with _pt.raises(ValueError):
        asof_join(l, r, ["k"], "ts", "ts", ["rid"], direction="sideways")
