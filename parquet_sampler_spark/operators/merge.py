"""CDC merge (upsert / delete) without a table format.

Delta/Iceberg's ``MERGE INTO`` needs their jars (absent here); the same
semantics compose from public DataFrame ops — the classic emulation:
``base ANTI-JOIN updates`` (untouched rows) ``UNION`` updates (new +
changed rows), with an optional delete predicate applied to the update
stream first.

Scale: one shuffle of base on the key for the anti-join (or zero if the
update set is broadcastable — it usually is, CDC batches are small
relative to the snapshot). Writing the merged snapshot rewrites the
table; with hive-partitioned output, restrict the rewrite to affected
partitions upstream (partition pruning on the update keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
    broadcast_updates: bool = True,
    validate_unique_keys: bool = True,
) -> DataFrame:
    """MERGE semantics: rows in ``updates`` replace base rows with the
    same key, new keys are inserted, and (if ``delete_col`` names a
    boolean column in updates) delete-marked keys are removed from the
    result. Update columns must match the base schema (plus the
    optional delete marker).

    Deterministic: if updates carries duplicate keys the caller must
    dedupe first (enforced by default — raises on duplicate update
    keys, the same constraint real MERGE INTO imposes). The guard costs
    one eager aggregate job over the (small, CDC-sized) update set; set
    ``validate_unique_keys=False`` when the producer already guarantees
    key uniqueness and the extra action matters (e.g. merge called in a
    tight loop).
    """
    for c in key_cols:
        if c not in base.columns or c not in updates.columns:
            raise ValueError(f"key column {c!r} missing from an input")

    if validate_unique_keys:
        dup = (
            updates.groupBy(*key_cols).count().filter(F.col("count") > 1)
        )
        if dup.limit(1).count() > 0:
            raise ValueError(
                "updates contain duplicate keys — MERGE requires at most "
                "one update row per key (dedupe first, e.g. exact_dedup)"
            )

    if delete_col is not None:
        deletes = updates.filter(F.col(delete_col))
        upserts = updates.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        deletes = None
        upserts = updates

    touched = upserts.select(*key_cols)
    if deletes is not None:
        touched = touched.union(deletes.select(*key_cols))
    if broadcast_updates:
        touched = F.broadcast(touched)

    untouched = base.join(touched, key_cols, "left_anti")
    return untouched.unionByName(upserts.select(*base.columns))
