"""As-of (point-in-time) join — an operator Spark has no native node for.

Semantics: for each left row, attach the single most recent right row
with ``right_ts <= left_ts`` within the same key group (the standard
financial/event-attribution join; DuckDB/`pd.merge_asof` call it ASOF).

Implementation — the *union-merge* formulation, not a range join:
tag both inputs, union them, and do ONE shuffle+sort per key over the
combined stream; a ``last(value, ignorenulls)`` running window carries
the latest right payload forward onto each left row. Cost is
O((|L|+|R|) log) with a single exchange on the key — versus the naive
inequality join which explodes to O(|L|·|R|) pairs per key and cannot
broadcast-prune. This plan scales to arbitrarily many keys/rows and
skew behaves like any groupBy (AQE skew handling applies).

Tie rule: right rows sort *before* left rows at equal timestamps
(inclusive ``<=``); among right duplicates at the same (key, ts) the
later-sorted payload wins deterministically via the struct ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__psx_side"
_VAL = "__psx_val"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    how: str = "inner",
    prefix: str = "asof_",
) -> DataFrame:
    """Output: all left columns + ``prefix + right_ts`` and
    ``prefix + c`` for each right value column (NULL / dropped when no
    right row precedes, per ``how`` ∈ {'inner', 'left'})."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    lt = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{right.schema[c].dataType.simpleString()}"
                for c in [right_ts, *right_value_cols]
            ) + ">"
        ).alias(_VAL),
    )
    # a NULL right timestamp would sort first (nulls-first ascending) and
    # carry a phantom payload onto left rows — it can never legitimately
    # satisfy right_ts <= left_ts, so drop such rows up front
    right = right.filter(F.col(right_ts).isNotNull())
    rt = right.select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{left.schema[c].dataType.simpleString()}"
                for c in left.columns
            ) + ">"
        ).alias("__lrow"),
        F.struct(
            F.col(right_ts), *[F.col(c) for c in right_value_cols]
        ).alias(_VAL),
    )

    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("__ts"), F.col(_SIDE), F.col(_VAL))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "__carry", F.last(_VAL, ignorenulls=True).over(w)
    ).filter(F.col(_SIDE) == 1)

    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"__carry.{right_ts}").alias(f"{prefix}{right_ts}"))
    out_cols += [
        F.col(f"__carry.{c}").alias(f"{prefix}{c}") for c in right_value_cols
    ]
    out = carried.select(*out_cols)
    if how == "inner":
        out = out.filter(F.col(f"{prefix}{right_ts}").isNotNull())
    return out
