"""OLAP breadth queries: set operations, scalar-function suite, distinct
aggregation, pivot, and window-function suite — demonstrating the
general-purpose SQL surface of the engine, each with a DuckDB oracle.

All numeric determinism rules from queries_ext apply: per-row scalar
arithmetic is IEEE-exact cross-engine; order-sensitive double
aggregations are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

def _q_set_ops(spark, sf_dir):
    """INTERSECT / EXCEPT demo over customer key sets: customers with
    orders vs customers in the BUILDING market segment."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    both = o.intersect(building).withColumn("tag", F.lit("both"))
    only_orders = (
        o.distinct().exceptAll(building).withColumn("tag", F.lit("orders_only"))
    )
    return both.unionByName(only_orders)


_SQL_SET_OPS = """
SELECT custkey, 'both' AS tag FROM (
  SELECT o_custkey AS custkey FROM orders
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT custkey, 'orders_only' AS tag FROM (
  SELECT DISTINCT o_custkey AS custkey FROM orders
  EXCEPT ALL
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


# ---------------------------------------------------------------------------
# Scalar function suite (string / date / math)
# ---------------------------------------------------------------------------

def _q_scalar_suite(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.length("o_orderstatus").alias("status_len"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.round(F.sqrt(F.abs(F.col("o_totalprice"))), 6).alias("sqrt_price"),
        F.round(F.col("o_totalprice") % 97.0, 6).alias("mod_price"),
        (F.col("o_orderkey") % 7).cast("bigint").alias("key_mod"),
    )


_SQL_SCALAR_SUITE = """
SELECT o_orderkey,
       upper(substr(o_orderpriority, 1, 3)) AS prio3,
       CAST(length(o_orderstatus) AS INT) AS status_len,
       concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(month(o_orderdate) AS INT) AS mo,
       CAST(day(o_orderdate) AS INT) AS dom,
       round(sqrt(abs(o_totalprice)), 6) AS sqrt_price,
       round(fmod(o_totalprice, 97.0), 6) AS mod_price,
       o_orderkey % 7 AS key_mod
FROM orders
"""


# ---------------------------------------------------------------------------
# Distinct aggregation
# ---------------------------------------------------------------------------

def _q_distinct_agg(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_partkey", "l_suppkey").alias("n_part_supp"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_SQL_DISTINCT_AGG = """
SELECT l_returnflag,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation — portable formulation)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def _q_pivot_events(spark, sf_dir):
    """Daily event-type count matrix via pivot. The oracle uses
    equivalent conditional aggregation (FILTER), which is what pivot
    compiles to anyway."""
    from parquet_sampler_spark.queries_ext import _events

    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


_SQL_PIVOT_EVENTS = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Window-function suite
# ---------------------------------------------------------------------------

def _q_window_suite(spark, sf_dir):
    """rank / dense_rank / lag / ntile / running sum over customer
    account balances per market segment. acctbal is two-decimal money:
    running sums stay exact in doubles at these magnitudes, but are
    rounded anyway to stay safe cross-engine."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return c.select(
        "c_custkey", "c_mktsegment", "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("c_custkey", 1).over(w).alias("prev_cust"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.sum("c_acctbal").over(wrun), 4).alias("running_bal"),
    )


_SQL_WINDOW_SUITE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk,
       lag(c_custkey, 1) OVER w AS prev_cust,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(sum(c_acctbal) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW), 4) AS running_bal
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey)
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "set_ops": _q_set_ops,
        "scalar_suite": _q_scalar_suite,
        "distinct_agg": _q_distinct_agg,
        "pivot_events": _q_pivot_events,
        "window_suite": _q_window_suite,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "set_ops": _SQL_SET_OPS,
        "scalar_suite": _SQL_SCALAR_SUITE,
        "distinct_agg": _SQL_DISTINCT_AGG,
        "pivot_events": _SQL_PIVOT_EVENTS,
        "window_suite": _SQL_WINDOW_SUITE,
    }
