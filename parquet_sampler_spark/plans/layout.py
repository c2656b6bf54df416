"""Physical-layout helpers: partitioning decisions that Catalyst does
not make for us.

A small Parquet file arrives as ONE input partition; any CPU-heavy
per-row operator chained on it (higher-order lambdas, Pandas UDFs,
nested-loop joins) then runs on one core. ``spread`` widens such inputs
to the session's default parallelism. For genuinely big inputs (many
splits already) it is a no-op — so operators can call it
unconditionally: at 100 TB the scan is already thousands of splits and
no shuffle is added.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session default parallelism iff
    the plan currently has fewer partitions. Cost: one shuffle of the
    (by assumption small) input; benefit: full-width CPU parallelism for
    expensive downstream map work."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
