"""Bucketed tables: pre-shuffled storage for co-located, exchange-free
joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle. Writing
both tables bucketed by the join key (`bucketBy(n, key)`) moves that
shuffle to write time, once; every later join/aggregation on the key
reads co-located buckets and plans with NO Exchange on either side
(asserted in tests/test_bucketing.py). This is the storage-layout
complement to `F.broadcast` (small dims) and AQE (runtime re-plan).

Bucketed tables must live in the session catalog (`saveAsTable`) — the
bucket metadata rides in the catalog, not the parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.
    Sorting within buckets additionally unlocks merge-join without a
    sort step."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on the join key. With matching bucket
    counts Catalyst plans a SortMergeJoin with ZERO Exchange — verify
    with ``.explain()``; tests assert the absence programmatically."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(
        spark.table(right_table), keys, how
    )
