"""Distributed table-integrity fingerprints: order-independent,
bucket-localized checksums for verifying that two copies of a table
(replica, migration target, CDC-maintained mirror) hold the same rows
WITHOUT shipping or sorting the data.

The per-row hash is the repo's portable integer Lehmer arithmetic
(functions/hashing.py) so a DuckDB oracle — or any other engine — can
recompute the identical fingerprint; aggregation uses BIT_XOR (order-
independent, width-preserving) plus an additive 20-bit-residue sum
(catches duplicate-pair swaps that XOR cancels; < 2^62 for up to
~4e12 rows per bucket). A mismatch localizes the repair to one bucket
(1/``buckets`` of the keyspace), the anti-entropy repair unit.

At 100 TB: one scan, all-JVM expressions, map-side-partial aggregate —
the only cross-partition traffic is ``buckets`` rows per map
partition regardless of table size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquet_sampler_spark.functions.hashing import (
    MODULUS,
    lehmer_hash,
    mixed_string_hash,
)

_SUM_RESIDUE = 1 << 20


def table_fingerprint(
    df: DataFrame,
    int_cols: list[str | Column],
    str_col: str | Column | None = None,
    bucket_col: str | Column | None = None,
    buckets: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Per-bucket (n_rows, xor_hash, sum_hash) fingerprint of ``df``.

    ``int_cols``: up to 5 integer-valued columns/expressions folded by
    the portable Lehmer hash (quantize doubles to exact cents/e4
    BIGINTs first — the caller owns the quantization contract; prefer
    NON-NEGATIVE values, since ``%``'s dividend-sign convention makes
    a negative input produce a negative — though still engine-portable
    and deterministic — hash). ``str_col``: optional string column/
    expression folded via the mixed polynomial hash. ``bucket_col``:
    integer expression to bucket the keyspace by (defaults to the
    first int col); pmod keeps buckets in [0, buckets) even for
    negative keys, preserving the 1/``buckets`` repair-localization
    contract.
    """
    if not int_cols:
        raise ValueError("table_fingerprint requires int_cols")
    h = lehmer_hash(list(int_cols), seed=seed)
    if str_col is not None:
        h = (h * F.lit(131) + mixed_string_hash(str_col)) % F.lit(MODULUS)
    b = bucket_col if bucket_col is not None else int_cols[0]
    b = F.col(b) if isinstance(b, str) else b
    rows = df.select(
        F.pmod(b, F.lit(buckets)).cast("bigint").alias("bucket"),
        h.alias("h"),
    )
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("h").alias("xor_hash"),
        F.sum(F.col("h") % F.lit(_SUM_RESIDUE)).cast("bigint")
        .alias("sum_hash"),
    )


def fingerprint_diff(fp_a: DataFrame, fp_b: DataFrame) -> DataFrame:
    """Buckets where two fingerprints disagree — the repair worklist.

    Full outer join on bucket (a fingerprint is <= ``buckets`` rows,
    so this is driver-trivial at any table size); a bucket appears iff
    any component differs or it exists on only one side.
    """
    a = fp_a.select(
        "bucket", F.col("n_rows").alias("a_rows"),
        F.col("xor_hash").alias("a_xor"), F.col("sum_hash").alias("a_sum"),
    )
    b = fp_b.select(
        "bucket", F.col("n_rows").alias("b_rows"),
        F.col("xor_hash").alias("b_xor"), F.col("sum_hash").alias("b_sum"),
    )
    j = a.join(b, "bucket", "full_outer")
    return j.filter(
        ~(F.col("a_rows").eqNullSafe(F.col("b_rows"))
          & F.col("a_xor").eqNullSafe(F.col("b_xor"))
          & F.col("a_sum").eqNullSafe(F.col("b_sum")))
    )
