"""Adversarial-boundary tests for queries_ext.bucketed_trailing_range:
the time-bucketed two-pass RANGE frame must equal the flat
single-window formulation on every edge the carry construction has —
rows exactly on bucket boundaries, frame starts landing exactly on a
carry row, duplicate timestamps (RANGE peers) within and across
buckets, negative timestamps (floor toward -inf), empty buckets, and
single-row partitions. The 10M-row structural check lives in
test_scale_smoke; this file is the semantics net.
"""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from parquet_sampler_spark.queries_ext import bucketed_trailing_range

W = 10  # tiny window/bucket width so boundaries are easy to hit


def _flat(df, w_us):
    w = (
        Window.partitionBy("part").orderBy("us")
        .rangeBetween(-w_us, 0)
    )
    return df.select(
        "rid",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("vc").over(w).alias("s"),
    )


def _run(spark, rows, w_us=W):
    df = spark.createDataFrame(
        [(i, p, us, vc) for i, (p, us, vc) in enumerate(rows)],
        "rid long, part string, us long, vc long",
    )
    got = {
        r["rid"]: (r["__n"], r["__sum"])
        for r in bucketed_trailing_range(
            df, "part", "us", "vc", w_us
        ).collect()
    }
    want = {r["rid"]: (r["n"], r["s"]) for r in _flat(df, w_us).collect()}
    assert got == want and len(got) == len(rows)
    return got


def test_bucket_boundaries_and_carry_edges(spark):
    rows = [
        # t exactly on bucket boundaries: frame [t-W, t] includes the
        # previous boundary row exactly (RANGE inclusive both ends)
        ("a", 0, 1), ("a", 10, 2), ("a", 20, 4),
        # frame start landing exactly on a carried row: 25-10=15
        ("a", 15, 8), ("a", 25, 16),
        # sparse: empty bucket between 25 and 57
        ("a", 57, 32),
    ]
    got = _run(spark, rows)
    assert got[2] == (3, 14)   # t=20 sees 10, 15, 20
    assert got[4] == (3, 28)   # t=25 sees 15, 20, 25
    assert got[5] == (1, 32)   # t=57 sees only itself


def test_duplicate_timestamps_are_peers_across_buckets(spark):
    rows = [
        ("a", 9, 1), ("a", 9, 2),        # peers in bucket 0
        ("a", 10, 4), ("a", 10, 8),      # peers in bucket 1, frame
        ("a", 19, 16),                   # includes all four above
        ("b", 9, 100),                   # other partition untouched
    ]
    got = _run(spark, rows)
    assert got[0] == (2, 3) and got[1] == (2, 3)   # RANGE peers
    assert got[2] == (4, 15) and got[3] == (4, 15)
    assert got[4] == (5, 31)
    assert got[5] == (1, 100)


def test_negative_timestamps_floor_alignment(spark):
    # floor(-1/10) = -1, so -1 sits in bucket -1 and 0 in bucket 0;
    # the frame [-10, 0] must still see both
    rows = [("a", -10, 1), ("a", -1, 2), ("a", 0, 4), ("a", 9, 8)]
    got = _run(spark, rows)
    assert got[1] == (2, 3)      # -1 sees -10, -1
    assert got[2] == (3, 7)      # 0 sees -10, -1, 0
    assert got[3] == (3, 14)     # 9 sees -1, 0, 9 (-10 < 9-10)


def test_single_row_partitions_and_invalid_window(spark):
    got = _run(spark, [("a", 5, 1), ("b", 5, 2), ("c", -3, 4)])
    assert got == {0: (1, 1), 1: (1, 2), 2: (1, 4)}
    df = spark.createDataFrame([(0, "a", 1, 1)],
                               "rid long, part string, us long, vc long")
    with pytest.raises(ValueError, match="window_us"):
        bucketed_trailing_range(df, "part", "us", "vc", 0)


def test_bucket_ids_exact_beyond_2_53(spark):
    """Bucket alignment must be exact over the full int64 range: the
    old double-division floor misbuckets once |us| > 2^53 (e.g. a
    nanosecond-resolution or synthetic large domain)."""
    base = (1 << 60) + 7        # not representable in double
    w = 1000
    rows = [("p", base + d, 1.0) for d in (-1, 0, 1, w - 1, w)]
    df = spark.createDataFrame(rows, "part string, us long, vc double")
    out = bucketed_trailing_range(df, "part", "us", "vc", w)
    got = {r["us"]: r["__n"] for r in out.collect()}
    # exact integer trailing [us-w, us] counts, verified against a
    # python reference
    xs = sorted(r[1] for r in rows)
    expect = {
        x: sum(1 for y in xs if x - w <= y <= x) for x in xs
    }
    assert got == expect
