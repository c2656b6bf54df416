"""Interval (range) join: the bucket equi-join strategy must agree
exactly with the broadcast nested-loop reference on every boundary."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.operators.rangejoin import interval_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes, micros=0):
    return T0 + dt.timedelta(minutes=minutes, microseconds=micros)


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (1, _ts(0)),          # exactly at interval start
        (2, _ts(29, 999_999)),  # 1us before a 30-min interval end
        (3, _ts(30)),         # exactly at end -> excluded from [0, 30)
        (4, _ts(75)),         # mid second interval
        (5, _ts(200)),        # matches nothing
        (6, _ts(-30)),        # before every interval
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


@pytest.fixture(scope="module")
def intervals(spark):
    rows = [
        (100, _ts(0), _ts(30)),     # [0, 30) min
        (101, _ts(60), _ts(120)),   # [60, 120) — spans 2 hour-buckets
        (102, _ts(10), _ts(10)),    # empty (end == start)
        (103, _ts(50), _ts(40)),    # inverted (end < start)
        (104, _ts(-60), _ts(1)),    # crosses T0
    ]
    return spark.createDataFrame(
        rows, "window_id long, w_start timestamp, w_end timestamp"
    )


def _pairs(df):
    return sorted(
        (r.event_id, r.window_id)
        for r in df.select("event_id", "window_id").collect()
    )


EXPECTED = [
    (1, 100), (1, 104),   # ts(0) in [0,30) and in [-60,1)
    (2, 100),
    (4, 101),
    (6, 104),
]


def test_bucket_matches_reference(spark, facts, intervals):
    for bucket_seconds in (60, 1800, 3600, 86_400):
        got = interval_join(
            facts, intervals, "ts", "w_start", "w_end",
            method="bucket", bucket_seconds=bucket_seconds,
        )
        assert _pairs(got) == EXPECTED, f"g={bucket_seconds}"


def test_broadcast_reference(spark, facts, intervals):
    got = interval_join(
        facts, intervals, "ts", "w_start", "w_end", method="broadcast"
    )
    assert _pairs(got) == EXPECTED


def test_no_duplicate_pairs_across_buckets(spark, facts, intervals):
    # an interval spanning many tiny buckets must still emit each
    # matching fact exactly once
    got = interval_join(
        facts, intervals, "ts", "w_start", "w_end",
        method="bucket", bucket_seconds=60,
    )
    pairs = _pairs(got)
    assert len(pairs) == len(set(pairs))


def test_column_collision_rejected(spark, facts):
    clashing = facts.select(
        "event_id", F.col("ts").alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    with pytest.raises(ValueError, match="collision"):
        interval_join(facts, clashing, "ts", "w_start", "w_end")


def test_unknown_method_rejected(spark, facts, intervals):
    with pytest.raises(ValueError, match="method"):
        interval_join(
            facts, intervals, "ts", "w_start", "w_end", method="sort"
        )
