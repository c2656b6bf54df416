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


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """All values of ``col`` occurring in strictly more than ``1/k`` of
    the rows, with their EXACT counts.

    Two-phase plan, no full-width shuffle of the raw rows:

    1. **Candidates** (one ``mapInPandas`` pass): each partition emits
       the values that are locally heavy — ``local_count * k >
       partition_rows``. By pigeonhole at most ``k-1`` values qualify
       per partition, so the candidate relation is bounded by
       ``(k-1) * n_partitions`` rows regardless of data size.
       *Superset guarantee*: if a value is globally heavy
       (``global_count * k > n``) it must be locally heavy in at least
       one partition — otherwise summing ``local_count * k <= n_p``
       over partitions gives ``global_count * k <= n``, a
       contradiction. Adversarial spreading across partitions cannot
       evade this (the bound is per-partition-size, not per-item).
    2. **Verify** (one aggregation restricted to candidates): exact
       counts of candidate values via a broadcast semi-join, then the
       exact global threshold ``count * k > n``. False candidates are
       dropped here, so the sketch phase only ever affects cost, never
       the answer.

    ``n`` is computed with a count over the (possibly filtered) input —
    at 100 TB prefer passing a pre-aggregated count through a metadata
    path if available; the comparison stays in exact BIGINT arithmetic
    (``count * k > n``, never a float fraction), so engine-portable
    oracles compare bit-for-bit.
    """
    if k < 2:
        raise ValueError(f"heavy_hitters needs k >= 2, got {k}")
    src = df.select(F.col(col).alias("__hh_key")).filter(
        F.col("__hh_key").isNotNull()
    )

    def local_heavy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict = {}
        n_part = 0
        for b in batches:
            n_part += len(b)
            vc = b["__hh_key"].value_counts()
            for key, c in vc.items():
                counts[key] = counts.get(key, 0) + int(c)
        keys = [key for key, c in counts.items() if c * k > n_part]
        yield pd.DataFrame({"__hh_key": pd.Series(keys, dtype=object)})

    candidates = (
        src.mapInPandas(local_heavy, schema=src.schema)
        .distinct()
    )
    n = src.count()
    return (
        src.join(F.broadcast(candidates), "__hh_key")
        .groupBy("__hh_key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > F.lit(n))
        .select(F.col("__hh_key").alias(col), "cnt")
    )
