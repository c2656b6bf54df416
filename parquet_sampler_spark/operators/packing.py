"""Training-sequence packing: the concat-then-chunk layout step of a
GPT-style pretraining pipeline.

Reference parity note: the reference engine (andreaskipf/parquet-sampler,
lib.rs) has no packing operator — this module is part of the mandated
beyond-reference LLM-pipeline scope. Semantics follow the standard
concatenate-and-chunk recipe of GPT-2/-3 style pretraining (documents
concatenated in a fixed order into one token stream, sliced into
fixed-length training sequences; documents crossing a slice boundary are
split across sequences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from parquet_sampler_spark.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    cap: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every document its place in fixed-length training
    sequences under concat-then-chunk packing, sharded for parallelism.

    The corpus is split into ``n_shards`` deterministic hash shards
    (``pmod(id, n_shards)`` — the NON-NEGATIVE remainder, so negative
    ids shard consistently with the SQL oracle's ``((id % n) + n) %
    n``); within each shard, documents are concatenated
    in ``id_col`` order into one notional token stream, and that stream
    is sliced into back-to-back sequences of exactly ``cap`` tokens
    (the last slice of a shard may be short). A document whose tokens
    straddle a slice boundary is split across consecutive sequences —
    exactly the layout a GPT-style loader materializes.

    Output, one row per document with at least one token:
    ``(id_col, shard, n_tokens, seq_first, seq_last, n_seqs,
    seq_offset)`` where ``seq_first``/``seq_last`` are the 0-based
    indices (within the shard) of the first/last sequence the document
    touches, ``n_seqs = seq_last - seq_first + 1`` is how many
    sequences it spans, and ``seq_offset`` is its starting token
    position inside ``seq_first``. Zero-token documents occupy no
    stream positions and are excluded.

    Plan shape (the 100 TB contract): ONE window (cumulative sum) per
    shard — shards are hash-balanced so the windows parallelize across
    the cluster, and everything is JVM expressions (token counts,
    integer div/mod); no Python, no join, no self-anything. Packing is
    inherently sequential *within* a stream; sharding is how real
    pipelines bound that (each shard is an independent stream), and
    ``n_shards`` scales with the corpus.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")

    tok = token_count(F.col(text_col))
    base = (
        df.select(
            F.col(id_col),
            F.pmod(F.col(id_col), F.lit(n_shards)).cast("bigint").alias(
                "shard"
            ),
            tok.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("__cum_end", F.sum("n_tokens").over(w))
        .withColumn("__cum_before", F.col("__cum_end") - F.col("n_tokens"))
        .select(
            id_col,
            "shard",
            "n_tokens",
            # integer DIV keeps the arithmetic exact at any stream length
            F.expr(f"__cum_before DIV {cap}").alias("seq_first"),
            F.expr(f"(__cum_end - 1) DIV {cap}").alias("seq_last"),
            F.pmod(F.col("__cum_before"), F.lit(cap)).alias("seq_offset"),
        )
        .withColumn(
            "n_seqs", F.col("seq_last") - F.col("seq_first") + F.lit(1)
        )
    )
