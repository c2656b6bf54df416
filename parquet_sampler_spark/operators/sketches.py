"""Frequency-sketch operators: exact distributed heavy hitters via the
candidates-then-verify plan.

The reference engine has no sketch surface (SURVEY.md §2.2); this is
beyond-reference scale machinery. The pattern here — a bounded
per-partition summary proposes candidates, one exact pass verifies —
returns EXACT answers with sketch-shaped cost, which is why the query
registry can give it a plain-SQL oracle (unlike HLL/GK whose raw
estimates are engine-specific and need error-envelope oracles).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_update(counters: dict, key, w: int, cap: int) -> None:
    """Weighted Misra-Gries update: add ``w`` occurrences of ``key``
    to a summary holding at most ``cap`` counters. On overflow, the
    standard decrement step subtracts the minimum counter value from
    every counter and drops zeros — each subtraction of d accounts for
    d·(cap+1) input rows, which is what bounds the undercount."""
    if key in counters:
        counters[key] += w
        return
    counters[key] = w
    if len(counters) > cap:
        d = min(counters.values())
        dead = []
        for k2 in counters:
            counters[k2] -= d
            if counters[k2] <= 0:
                dead.append(k2)
        for k2 in dead:
            del counters[k2]


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """All values of ``col`` occurring in strictly more than ``1/k`` of
    the rows, with their EXACT counts.

    Two-phase plan, no full-width shuffle of the raw rows:

    1. **Candidates** (one ``mapInPandas`` pass): each partition keeps
       a weighted Misra-Gries summary of at most ``k-1`` counters —
       O(k) memory regardless of the partition's distinct-key count —
       and emits its surviving keys plus the partition row count.
       *Superset guarantee*: an MG summary undercounts any key by at
       most ``n_p/k``, so a key whose counter is zero in EVERY
       partition has true local count ≤ ``n_p/k`` everywhere, hence
       global count ≤ ``n/k`` — i.e. every globally-heavy value
       (``count*k > n``) survives in at least one partition summary,
       under any adversarial spread. The candidate relation is bounded
       by ``(k-1+1) * n_partitions`` rows.
    2. **Verify** (one aggregation restricted to candidates): exact
       counts of candidate values via a broadcast semi-join, then the
       exact global threshold ``count * k > n``. False candidates are
       dropped here, so the sketch phase only ever affects cost, never
       the answer.

    ``n`` comes from per-partition row counts carried on the summary
    rows, so one bounded collect (≤ k rows per partition) serves both
    the total and the candidate keys and the input is scanned exactly
    twice: once for summaries, once for verification. The threshold
    compare stays in exact BIGINT arithmetic (``count * k > n``, never
    a float fraction), so engine-portable oracles compare bit-for-bit.
    """
    if k < 2:
        raise ValueError(f"heavy_hitters needs k >= 2, got {k}")
    src = df.select(F.col(col).alias("__hh_key")).filter(
        F.col("__hh_key").isNotNull()
    )
    key_field = src.schema.fields[0]
    # the summary stream carries a None-keyed row-count marker per
    # partition, so its key column must be nullable even when the
    # (NULL-filtered) input column is not
    summary_schema = T.StructType(
        [
            T.StructField(key_field.name, key_field.dataType, True),
            T.StructField("__hh_n", T.LongType(), True),
        ]
    )

    def local_summary(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_part = 0
        for b in batches:
            n_part += len(b)
            vc = b["__hh_key"].value_counts()
            for key, c in vc.items():
                _mg_update(counters, key, int(c), k - 1)
        keys = list(counters.keys())
        yield pd.DataFrame(
            {
                "__hh_key": pd.Series(keys + [None], dtype=object),
                "__hh_n": pd.Series(
                    [None] * len(keys) + [n_part], dtype="object"
                ),
            }
        )

    # One job drains the summaries to the driver — bounded by
    # (k-1 candidates + 1 count row) per partition, so safe to collect
    # even at large partition counts for sketch-sized k. This keeps the
    # plan at exactly TWO input scans (summaries, verify) with no
    # persist lifetime to manage.
    rows = src.mapInPandas(
        local_summary, schema=summary_schema
    ).collect()
    n = sum(r["__hh_n"] for r in rows if r["__hh_n"] is not None)
    keys = sorted({r["__hh_key"] for r in rows if r["__hh_key"] is not None})
    spark = df.sparkSession
    if not keys:
        empty = spark.createDataFrame([], schema=T.StructType(
            [key_field, T.StructField("cnt", T.LongType(), False)]
        ))
        return empty.withColumnRenamed("__hh_key", col)
    candidates = spark.createDataFrame(
        [(key,) for key in keys], schema=T.StructType([key_field])
    )
    return (
        src.join(F.broadcast(candidates), "__hh_key")
        .groupBy("__hh_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n))
        .select(F.col("__hh_key").alias(col), "cnt")
    )
