"""Snapshot diff: row-level change classification between two versions
of a table — the read side of the CDC story (operators/merge.py is the
write side). Given an old and a new snapshot sharing a schema and a key,
emit one row per changed key with ``change_type`` in
``('added', 'deleted', 'changed')``; unchanged keys are dropped.

Scale design: ONE full-outer shuffle join on the key — no collect, no
window. Non-key columns are compared as a single null-safe struct
equality (JVM-side, codegen'd); at 100 TB the payload comparison adds
no extra shuffle because it rides the join. Duplicate keys on either
side are rejected (a diff keyed on a non-key is meaningless) via a
cheap count-check the caller can disable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OLD, _NEW = "__psx_old_payload", "__psx_new_payload"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    check_unique: bool = True,
) -> DataFrame:
    """Classify every key as added / deleted / changed between
    snapshots. Output: key columns + ``change_type``; the key columns
    come from whichever side has the row (coalesced)."""
    if not key_cols:
        raise ValueError("snapshot_diff requires key columns")
    if set(old.columns) != set(new.columns):
        raise ValueError(
            "snapshots must share a schema: "
            f"{sorted(set(old.columns) ^ set(new.columns))} differ"
        )
    missing = [k for k in key_cols if k not in old.columns]
    if missing:
        raise ValueError(f"key columns not in snapshot: {missing}")
    payload = [c for c in old.columns if c not in key_cols]

    if check_unique:
        for side, df in (("old", old), ("new", new)):
            dups = (
                df.groupBy(*key_cols).count().filter(F.col("count") > 1)
            )
            if dups.limit(1).count() > 0:
                raise ValueError(
                    f"{side} snapshot has duplicate keys on {key_cols}"
                )

    # column order inside the struct is fixed by `payload`, so the
    # null-safe struct comparison is field-by-field on aligned names
    o = old.select(
        *key_cols,
        F.struct(*[F.col(c) for c in payload]).alias(_OLD),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in key_cols],
        F.struct(*[F.col(c) for c in payload]).alias(_NEW),
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for k in key_cols:
        clause = F.col(k).eqNullSafe(F.col(f"__n_{k}"))
        cond = clause if cond is None else cond & clause
    joined = o.join(n, cond, "full_outer")

    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(~F.col(_OLD).eqNullSafe(F.col(_NEW)), F.lit("changed"))
    )  # unchanged -> NULL -> filtered
    keys = [
        F.coalesce(F.col(k), F.col(f"__n_{k}")).alias(k)
        for k in key_cols
    ]
    return (
        joined.select(*keys, change.alias("change_type"))
        .filter(F.col("change_type").isNotNull())
    )
