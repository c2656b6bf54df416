"""As-of (point-in-time) join — an operator Spark has no native node for.

Semantics: for each left row, attach ONE right row within the same key
group selected by ``direction`` (the full ``pd.merge_asof`` surface):

* ``backward`` (default): the most recent right row with
  ``right_ts <= left_ts`` — the standard financial/event-attribution
  join; DuckDB/`pd.merge_asof` call it ASOF.
* ``forward``: the earliest right row with ``right_ts >= left_ts``.
* ``nearest``: whichever of the two is closer; equal distances break
  to the backward row (``pd.merge_asof`` compatible).

``tolerance`` (optional) voids a match farther than the given distance
(same difference domain as the timestamp columns: a number for numeric
timestamps, an INTERVAL Column for TIMESTAMP columns) — NULL under
``how='left'``, dropped under ``'inner'``.

Implementation — the *union-merge* formulation, not a range join:
tag both inputs, union them, and do ONE shuffle per key over the
combined stream; a running ``last(value, ignorenulls)`` window carries
the latest right payload forward onto each left row (and, for
``forward``/``nearest``, a mirrored ``first(...)`` window carries the
next payload backward — same exchange, one extra sort). Cost is
O((|L|+|R|) log) with a single exchange on the key — versus the naive
inequality join which explodes to O(|L|·|R|) pairs per key and cannot
broadcast-prune. This plan scales to arbitrarily many keys/rows and
skew behaves like any groupBy (AQE skew handling applies).

Tie rules (all deterministic, replicated by the SQL oracles): at equal
timestamps the comparison is inclusive in BOTH directions; among right
duplicates at the same (key, ts) the backward pick is the LARGEST
``(right_ts, *value_cols)`` struct and the forward pick the SMALLEST;
``nearest`` prefers backward on equal distance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """Output: all left columns + ``prefix + right_ts`` and
    ``prefix + c`` for each right value column (NULL / dropped when no
    right row matches, per ``how`` ∈ {'inner', 'left'})."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            "direction must be 'backward', 'forward' or 'nearest', "
            f"got {direction!r}"
        )

    rstruct_type = (
        "struct<" + ",".join(
            f"`{c}`:{right.schema[c].dataType.simpleString()}"
            for c in [right_ts, *right_value_cols]
        ) + ">"
    )
    lt = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(rstruct_type).alias(_VAL),
    )
    # a NULL right timestamp would sort first (nulls-first ascending) and
    # carry a phantom payload onto left rows — it can never legitimately
    # satisfy either direction's comparison, so drop such rows up front
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
    carried = merged
    if direction in ("backward", "nearest"):
        # right rows (side 0) sort BEFORE left rows at equal ts, so the
        # inclusive <= holds; last() picks the largest same-ts struct
        wb = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("__ts"), F.col(_SIDE), F.col(_VAL))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = carried.withColumn(
            "__cb", F.last(_VAL, ignorenulls=True).over(wb)
        )
    if direction in ("forward", "nearest"):
        # left rows sort BEFORE right rows at equal ts (side desc), so
        # the frame starting at the left row still sees same-ts right
        # rows; first() picks the smallest same-ts struct
        wf = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col("__ts"), F.col(_SIDE).desc(), F.col(_VAL))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = carried.withColumn(
            "__cf", F.first(_VAL, ignorenulls=True).over(wf)
        )
    rows = carried.filter(F.col(_SIDE) == 1)

    if direction == "backward":
        chosen = F.col("__cb")
    elif direction == "forward":
        chosen = F.col("__cf")
    else:
        bd = F.col("__ts") - F.col(f"__cb.{right_ts}")
        fd = F.col(f"__cf.{right_ts}") - F.col("__ts")
        chosen = (
            F.when(F.col("__cb").isNull(), F.col("__cf"))
            .when(F.col("__cf").isNull(), F.col("__cb"))
            .when(bd <= fd, F.col("__cb"))  # ties prefer backward
            .otherwise(F.col("__cf"))
        )
    rows = rows.withColumn("__chosen", chosen)

    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        cts = F.col(f"__chosen.{right_ts}")
        dist = F.when(cts >= F.col("__ts"), cts - F.col("__ts")).otherwise(
            F.col("__ts") - cts
        )
        rows = rows.withColumn(
            "__chosen",
            F.when(dist <= tol, F.col("__chosen")).otherwise(
                F.lit(None).cast(rstruct_type)
            ),
        )

    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(
        F.col(f"__chosen.{right_ts}").alias(f"{prefix}{right_ts}")
    )
    out_cols += [
        F.col(f"__chosen.{c}").alias(f"{prefix}{c}")
        for c in right_value_cols
    ]
    out = rows.select(*out_cols)
    if how == "inner":
        out = out.filter(F.col(f"{prefix}{right_ts}").isNotNull())
    return out
