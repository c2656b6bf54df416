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
    if _num_partitions(df) < target:
        return df.repartition(target)
    return df


def _num_partitions(df: DataFrame) -> int:
    """Partition count of the physical plan without constructing a
    Python-side RDD: ``df.rdd`` builds a JVM→Python conversion pipeline
    (serializer + mapPartitions) per call, noticeable when every
    text/vector operator probes its input width. ``toRdd`` on the query
    execution is the already-planned internal RDD. Falls back to
    ``df.rdd`` for API drift."""
    try:
        return df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df.rdd.getNumPartitions()


def cluster_by_range(
    df: DataFrame, cols: list[str], num_files: int
) -> DataFrame:
    """Range-cluster rows for write: ``repartitionByRange`` on ``cols``
    (one sampled range shuffle) + ``sortWithinPartitions`` — each output
    file then covers a narrow, non-overlapping value range, so parquet
    row-group min/max statistics let later filtered scans SKIP whole
    files/row groups instead of reading them. At 100 TB this is the
    difference between a time-range query touching one day's files and
    touching all of them. Write the result with
    :func:`~parquet_sampler_spark.sources.io.write_parquet`."""
    if not cols:
        raise ValueError("cluster_by_range requires at least one column")
    return df.repartitionByRange(num_files, *cols).sortWithinPartitions(
        *cols
    )
