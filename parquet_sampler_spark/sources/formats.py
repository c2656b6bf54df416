"""Beyond-Parquet sources & sinks: CSV, JSON (lines), ORC.

The reference supports Parquet only (SURVEY.md §2.2 — no CSV/JSON/ORC/
JDBC anywhere in src/); a complete engine needs the standard lake
formats. All readers take an explicit schema by default — schema
inference re-reads the data and is nondeterministic under dirty input,
the classic production footgun.

Format notes for scale: Parquet/ORC are splittable + columnar
(pushdown, pruning); JSON-lines and uncompressed CSV are splittable but
row-oriented (full-row parse, no pushdown) — fine as ingest, wrong as
an analytics working set. ``convert_to_parquet`` is the canonical
landing step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.options(**options).csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).json(path)


def read_orc(spark: SparkSession, path: str, **options) -> DataFrame:
    return spark.read.options(**options).orc(path)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def convert_to_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    in_format: str = "csv",
    schema: T.StructType | str | None = None,
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Land a row-format dataset as Parquet (optionally hive-partitioned
    on ``partition_by`` — the layout that unlocks partition pruning for
    every later query)."""
    readers = {"csv": read_csv, "json": read_json, "orc": read_orc}
    if in_format not in readers:
        raise ValueError(f"unsupported format {in_format!r}")
    df = readers[in_format](spark, in_path, schema=schema, **options) \
        if in_format != "orc" else read_orc(spark, in_path, **options)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_path)
