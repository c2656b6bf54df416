"""Streaming CDC apply: merge each micro-batch into a parquet snapshot.

``foreachBatch`` + :func:`~parquet_sampler_spark.operators.merge.
merge_upsert` gives MERGE-into-table semantics without a table format:
every micro-batch of upserts/deletes is merged against the current
snapshot and a new snapshot is swapped in. Exactly-once is by
IDEMPOTENCE: re-applying a replayed batch of key-level upserts/deletes
yields the identical snapshot, so Structured Streaming's at-least-once
foreachBatch contract suffices.

Scale honesty: the swap (write temp → replace) is not crash-atomic.
A failure between rmtree and rename loses the live snapshot directory;
the temp copy still holds the correct merged state, and the sink
REFUSES to restart over the wreckage (leftover ``.__tmp_batch*`` with
no snapshot → loud RuntimeError for manual recovery) instead of
silently re-initializing from one replayed batch. Real deployments use
a transactional table format (Delta/Iceberg — jars not present here);
this module is the engine-level emulation of the same plan shape, and
the per-batch merge itself is the scalable part: one anti-join of the
snapshot against a broadcastable CDC batch.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parquet_sampler_spark.operators.merge import merge_upsert


def stream_merge_sink(
    updates: DataFrame,
    base_path: str,
    key_cols: list[str],
    delete_col: str | None = None,
    order_col: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Return a started-ready ``DataStreamWriter`` that merges every
    micro-batch of ``updates`` into the parquet snapshot at
    ``base_path`` (created on first batch). Caller picks the trigger
    and calls ``.start()``.

    ``order_col``: a column that totally orders CDC events per key
    (sequence number / commit timestamp). Each micro-batch is first
    COMPACTED to the last event per key — several changes to one key
    landing in one batch is the normal CDC case, not an error (an
    insert-then-delete batch nets out to the delete). Without
    ``order_col``, batches must carry at most one event per key
    (``merge_upsert`` validates and raises otherwise — on every batch,
    including the first).
    """

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if order_col is not None:
            # keep-last-per-key compaction in event order
            w = Window.partitionBy(*key_cols).orderBy(
                F.col(order_col).desc()
            )
            batch_df = (
                batch_df.withColumn("__psx_rn", F.row_number().over(w))
                .filter(F.col("__psx_rn") == 1)
                .drop("__psx_rn", order_col)
            )
        data_cols = [c for c in batch_df.columns if c != delete_col]
        have_base = os.path.isdir(base_path)
        if not have_base and glob.glob(f"{base_path}.__tmp_batch*"):
            raise RuntimeError(
                f"no snapshot at {base_path} but leftover temp "
                f"snapshot(s) exist — a previous swap crashed between "
                f"remove and rename; recover manually from the newest "
                f"{base_path}.__tmp_batch* before restarting"
            )
        if have_base:
            base = spark.read.parquet(base_path)
        else:
            # empty base with the data schema: the first batch goes
            # through the SAME merge path (dup-key validation, delete
            # handling) as every later batch
            base = batch_df.limit(0).select(*data_cols)
        merged = merge_upsert(
            base, batch_df, key_cols, delete_col=delete_col
        )
        tmp = f"{base_path}.__tmp_batch{batch_id}"
        merged.select(*data_cols).write.mode("overwrite").parquet(tmp)
        if os.path.isdir(base_path):
            shutil.rmtree(base_path)
        os.rename(tmp, base_path)

    writer = updates.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer
