"""Streaming joins and the online exact-k sampler.

* :func:`stream_stream_attribution` — watermarked stream-stream interval
  join: each purchase joins clicks from the same user within a lookback
  window. The watermark bounds both sides' join state; without it a
  stream-stream join must keep everything forever.
* :func:`streaming_exact_sample` — the reference's exact-count-sample
  semantic, online: a ``foreachBatch`` loop maintains a k-row reservoir
  as "k smallest Lehmer-hash rows seen so far". Deterministic (same
  hash as the batch sampler), so after consuming the whole input the
  reservoir EQUALS the batch ``sample_exact`` top-k for the same seed —
  a streaming/batch consistency property most samplers can't offer.
  State is the k-row parquet reservoir itself; each batch does a
  union + top-k, cost O(batch + k) — independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_sampler_spark.functions.hashing import lehmer_hash


def stream_stream_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join each purchase to all clicks by the same user in
    ``[purchase.ts - lookback, purchase.ts]``. Both sides watermarked so
    Spark can discard join state older than the watermark."""
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
    )
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("c_ts"),
        )
    )
    return p.join(
        c,
        F.expr(
            f"p_user = c_user AND c_ts <= p_ts "
            f"AND c_ts >= p_ts - interval {lookback}"
        ),
        "inner",
    ).select("purchase_id", "p_user", "p_ts", "click_id", "c_ts")


def streaming_exact_sample(
    events: DataFrame,
    k: int,
    reservoir_path: str,
    key_cols: list[str],
    seed: int = 42,
):
    """Maintain a k-row deterministic reservoir of the stream at
    ``reservoir_path`` (parquet).

    Invariant after each batch: reservoir = k smallest (pr, key) rows
    over ALL events consumed so far — so a replayed batch is a no-op
    (idempotent, exactly-once under the overwrite sink).

    Returns the ``DataStreamWriter`` (caller adds a trigger and calls
    ``.start()``). Local-filesystem reservoir paths only (existence is
    checked with os.path; swap for a FileSystem check on object stores).
    """
    import os

    spark = events.sparkSession
    pr = lehmer_hash(key_cols, seed)

    def merge_batch(batch: DataFrame, epoch_id: int) -> None:
        tagged = batch.withColumn("__pr", pr)
        # existence check, not a broad except: a transient READ error on
        # an existing reservoir must fail the batch (and be retried by
        # the stream), never silently reset accumulated state
        if os.path.exists(reservoir_path):
            current = spark.read.parquet(reservoir_path)
        else:
            current = None
        merged = (
            tagged if current is None else current.unionByName(tagged)
        )
        # dedupe on the logical key: a replayed/duplicated batch re-sends
        # rows already in the reservoir, and without this both copies
        # would survive the top-k — breaking replay idempotence
        # (observed in testing)
        top = (
            merged.dropDuplicates(key_cols)
            .orderBy(F.col("__pr"), *key_cols).limit(k)
        )
        # materialize before overwrite (the sink is also the source)
        rows = top.collect()
        out = spark.createDataFrame(rows, schema=top.schema)
        out.write.mode("overwrite").parquet(reservoir_path)

    return events.writeStream.foreachBatch(merge_batch)
