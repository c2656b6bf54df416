"""Interval (range) join: match fact rows whose event time falls inside
``[start, end)`` intervals — the time-window join the reference lacks
entirely (SURVEY.md §2.2 "no theta/range/as-of/interval" joins).

Two physical strategies, chosen by the caller:

- ``bucket`` (default, the 100 TB path): both sides are mapped to
  coarse time buckets — facts to ``floor(ts/g)``, each interval to the
  (exploded) bucket range it overlaps — and equi-joined on the bucket
  before the exact ``start <= ts < end`` filter. The shuffle is a plain
  hash join on an integer key; no cartesian product ever forms, and a
  fact row joins only the intervals sharing its bucket. Bucket
  granularity should be on the order of the typical interval length:
  each interval then explodes into ~2 rows, so the exploded build side
  is ~2x intervals, not unbounded.
- ``broadcast``: a BroadcastNestedLoopJoin with the raw range
  predicate. Only sane when the interval side is driver-small (it is
  broadcast whole); kept for tiny interval sets and as the semantic
  reference for the bucket plan in tests.

Both strategies emit each matching (fact, interval) pair exactly once:
in bucket mode a fact lives in exactly one bucket, and an interval is
listed at most once per bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__psx_ivj_bucket"


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    method: str = "bucket",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join ``facts`` to every interval with ``start <= ts < end``.

    Returns facts columns + interval columns (both sides' columns must
    be disjoint apart from none — rename upstream if they collide).
    ``ts_col`` names a timestamp column on facts; ``start_col`` /
    ``end_col`` name timestamp columns on intervals.
    """
    if method not in ("bucket", "broadcast"):
        raise ValueError(f"unknown interval_join method {method!r}")
    if int(bucket_seconds) <= 0:
        raise ValueError(
            f"bucket_seconds must be positive, got {bucket_seconds!r}"
        )
    overlap = set(facts.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"fact/interval column collision: {sorted(overlap)}; "
            "rename one side before joining"
        )
    ts = F.col(ts_col)
    start, end = F.col(start_col), F.col(end_col)
    cond = (ts >= start) & (ts < end)

    if method == "broadcast":
        return facts.join(F.broadcast(intervals), cond, "inner")

    g_us = int(bucket_seconds) * 1_000_000
    fact_b = facts.withColumn(
        _BUCKET, _bucket_of(F.unix_micros(ts), g_us)
    )
    # one row per bucket the interval overlaps; [start, end) touches
    # buckets floor(start/g) .. floor((end - 1us)/g). Empty intervals
    # (end <= start) produce an empty sequence and match nothing.
    lo = _bucket_of(F.unix_micros(start), g_us)
    hi = _bucket_of(F.unix_micros(end) - F.lit(1), g_us)
    iv_b = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.when(end > start, F.sequence(lo, hi)).otherwise(
                F.array().cast("array<bigint>")
            )
        ),
    )
    return (
        fact_b.join(iv_b, on=_BUCKET, how="inner")
        .filter(cond)
        .drop(_BUCKET)
    )


def _bucket_of(epoch_us: Column, g_us: int) -> Column:
    # Exact floor division also for negative epochs (pre-1970) and for
    # epochs beyond 2^52 us, where a double quotient's ulp exceeds
    # 1/g_us and an exact-boundary timestamp could land one bucket off.
    # pmod is non-negative, so (epoch - pmod) is the exact bigint floor
    # multiple; dividing it as decimal keeps the integral quotient exact.
    m = epoch_us - F.pmod(epoch_us, F.lit(g_us))
    return (m.cast("decimal(38,0)") / F.lit(g_us)).cast("bigint")
