"""Grouped-map UDAF pattern: per-group computations that need the whole
group in memory, via Arrow-batched ``applyInPandas``.

This is the extension point for group-wise logic the built-in aggregates
can't express (model fitting per key, sequence alignment, custom
sketches). The example operator — per-group quantile summaries — is
deliberately one that SQL *can* express, so the grouped-map machinery
itself is oracle-checkable: numpy's default linear interpolation is the
same ``pos = (n-1)·q`` formula as Spark ``percentile`` and DuckDB
``quantile_cont``, and the results are bit-identical.

Scale: one shuffle on the group key; each group must fit in one
executor's memory (the applyInPandas contract) — fine for
dimension-bounded groups, wrong for degenerate single-group inputs.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-group linear-interpolation quantiles + count of ``value_col``.

    Output: group_cols + ``q_25, q_50, ...`` (prob × 100, trailing zeros
    trimmed) + ``n``.
    """
    q_names = [f"q_{format(p * 100, 'g').replace('.', '_')}"
               for p in probs]
    out_schema = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols]
        + [f"{name} double" for name in q_names]
        + ["n bigint"]
    )

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        # drop NULLs like SQL aggregates do — NaN would poison the
        # interpolation and inflate n vs percentile/quantile_cont
        vals = np.sort(
            pdf[value_col].dropna().to_numpy(dtype=np.float64)
        )
        n = len(vals)
        row = {c: pdf[c].iloc[0] for c in group_cols}
        if n == 0:
            for name in q_names:
                row[name] = None
            row["n"] = 0
            return pd.DataFrame([row])
        for p, name in zip(probs, q_names):
            # Spark/DuckDB's exact formula: (1-t)*a + t*b. (Both
            # np.quantile's lerp and the a+(b-a)*t form differ in the
            # last ulp — enough to break value-hash comparison against
            # the SQL engines; verified empirically.)
            pos = (n - 1) * p
            lo = int(np.floor(pos))
            hi = min(lo + 1, n - 1)
            t = pos - lo
            row[name] = float((1 - t) * vals[lo] + t * vals[hi])
        row["n"] = n
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(summarize, out_schema)
