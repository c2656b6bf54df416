"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`parquet_sampler_spark.queries` — the registry of
Spark implementations and DuckDB oracle SQL for every operator from
SURVEY.md §2 (plus extensions).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from parquet_sampler_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's own
    composed workflow (README.md:15-26) — exact-count sample of lineitem,
    then broadcast semi-join reduction of orders."""
    return _registry.orders_reduced(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
