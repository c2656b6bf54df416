"""Pin the documented deviations of the adapted TPC-H queries.

The testdata schema has no ``partsupp`` table and no
``l_shipmode``/``l_commitdate``/``l_receiptdate`` columns, so several
queries run ADAPTED forms (VERDICT r4 'Next round' #6 asks for these
deltas to be pinned so a future reader cannot mistake them for the
standard queries). Each case asserts (a) the adaptation is documented
in the query's own docstring, and (b) the schema gap that forces it is
real. Plus the data property the q21/q4/q12 date-arithmetic rewrites
rely on: order/ship timestamps are midnight-only.

No Spark session needed — pure metadata + DuckDB checks, fast.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from parquet_sampler_spark import queries_olap

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")

# query -> (marker that must appear in its docstring, schema gap kind)
ADAPTED = {
    # partsupp-less adaptations: the standard forms price parts via
    # partsupp.ps_supplycost / aggregate over ps_availqty
    "tpch_q2": ("adapted", "partsupp"),
    "tpch_q9": ("adapted", "partsupp"),
    "tpch_q11": ("adapted", "partsupp"),
    "tpch_q16": ("adapted", "partsupp"),
    "tpch_q20": ("adapted", "partsupp"),
    # lineitem-date adaptations: no commitdate/receiptdate/shipmode, so
    # "late" is redefined as shipped > N days after o_orderdate
    "tpch_q4": ("adapted", "lineitem_dates"),
    "tpch_q12": ("adapted", "lineitem_dates"),
    "tpch_q21": ("adapted", "lineitem_dates"),
    # other documented reformulations
    "tpch_q5": ("adapted", None),
    "tpch_q7": ("adapted", None),
    "tpch_q19": ("adapted", None),
    "tpch_q22": ("adapted", None),
}


@pytest.mark.parametrize("name", sorted(ADAPTED))
def test_adaptation_is_documented(name):
    marker, gap = ADAPTED[name]
    fn = getattr(queries_olap, f"_q_{name}")
    doc = (fn.__doc__ or "").lower()
    assert marker in doc, (
        f"{name} runs a non-standard form but its docstring no longer "
        f"documents the adaptation"
    )


def test_partsupp_gap_is_real():
    """The partsupp adaptations exist because the table does not: if a
    future testdata generation adds partsupp, this failing test is the
    reminder to restore the standard q2/q9/q11/q16/q20 forms."""
    assert not os.path.exists(f"{SF_DIR}/partsupp.parquet")


def test_lineitem_date_gap_is_real():
    cols = [
        r[0] for r in duckdb.connect().execute(
            f"DESCRIBE SELECT * FROM '{SF_DIR}/lineitem.parquet'"
        ).fetchall()
    ]
    for missing in ("l_shipmode", "l_commitdate", "l_receiptdate"):
        assert missing not in cols, (
            f"{missing} now exists - q4/q12/q21 can use the standard "
            f"TPC-H lateness definition"
        )


def test_order_ship_timestamps_are_midnight_only():
    """q21's DATE-vs-DATE 90-day predicate (and the epoch-microsecond
    forms in q4/q12) are exactly equivalent to the timestamp forms
    because the generator emits midnight-only order/ship timestamps —
    the equivalence this pins."""
    con = duckdb.connect()
    for tbl, col in (("lineitem", "l_shipdate"), ("orders", "o_orderdate")):
        n = con.execute(
            f"SELECT count(*) FROM '{SF_DIR}/{tbl}.parquet' "
            f"WHERE {col} != date_trunc('day', {col})"
        ).fetchone()[0]
        assert n == 0, f"{tbl}.{col} has {n} non-midnight timestamps"
