"""Oracle output-type portability invariant.

Round-5 lesson: the driver's correctness gate fetches DuckDB results
through a normalizer whose rendering of wide types differs from plain
``fetchall()`` Python ints.  DuckDB widens ``sum(INTEGER/BIGINT)`` to
HUGEINT (int128); the two oracles that produced a HUGEINT output column
(``cube_pricing``, ``tpch_q12``) were exactly the two driver hash-reds
across rounds 4-5 while the builder's local replica stayed green.

Invariant pinned here: **no oracle_sql() string may produce a HUGEINT,
UHUGEINT, or DECIMAL output column.**  Aggregates over integer inputs
must be wrapped ``CAST(sum(...) AS BIGINT)`` at the outermost level.
See ORACLE_PORTABILITY.md ("output type widening") for the full risk
list — this is the output-side companion to the input-side semantics
audited there.

The sweep uses DuckDB's relational ``.types`` (no result fetch), so it
runs the full 100+ oracle registry in a few seconds at sf0.001.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Wide / engine-variant types whose rendering differs between DuckDB
# fetch paths (python int vs Arrow/pandas) and therefore between the
# builder's local gate and the driver's normalizer.
FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def oracle_map():
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
    import __spark_entry__ as e

    return e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return c


def test_no_wide_output_types(oracle_map, con):
    assert oracle_map, "oracle_sql() returned no entries"
    offenders: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, sql in oracle_map.items():
        try:
            types = [str(t).upper() for t in con.sql(sql).types]
        except Exception as ex:  # noqa: BLE001 — report per-oracle
            errors[name] = str(ex).splitlines()[0]
            continue
        flagged = [t for t in types if any(f in t for f in FORBIDDEN)]
        if flagged:
            offenders[name] = flagged
    assert not errors, f"oracle SQL failed to plan: {errors}"
    assert not offenders, (
        "oracles producing HUGEINT/DECIMAL output columns (driver "
        f"hash-red risk — CAST the aggregate to BIGINT): {offenders}"
    )


def test_known_fixed_queries_are_bigint(oracle_map, con):
    """Regression pin for the two round-4/5 driver reds specifically."""
    for name, cols in [
        ("cube_pricing", ["sum_qty"]),
        ("tpch_q12", ["high_line_count", "low_line_count"]),
    ]:
        if name not in oracle_map:
            pytest.skip(f"{name} not registered")
        rel = con.sql(oracle_map[name])
        tmap = {c: str(t).upper() for c, t in zip(rel.columns, rel.types)}
        for c in cols:
            assert tmap.get(c) == "BIGINT", (name, c, tmap.get(c))


def test_no_interval_comparisons(oracle_map):
    """`timestamp ± INTERVAL` inside a COMPARISON is the documented
    version-sensitive coercion behind the r4 tpch_q12 driver red
    (ORACLE_PORTABILITY.md row 1); time-window predicates must use
    exact epoch-µs arithmetic instead. The two allowed occurrences are
    value-producing only (the interval lands in an output column or a
    generate_series bound, both pinned by in-SQL comments)."""
    import re

    allowed = {"range_join_events", "gap_fill_events"}
    # match INTERVAL-literal syntax only (INTERVAL '1 hour' / INTERVAL
    # 1 HOUR / to_hours(..)-style is fine) — the bare substring match
    # this replaces (ADVICE r06) also tripped on aliases, string
    # literals and SQL comments containing the word
    interval_lit = re.compile(r"\binterval\s+'?\d", re.IGNORECASE)
    offenders = [
        name
        for name, sql in oracle_map.items()
        if interval_lit.search(sql) and name not in allowed
    ]
    assert not offenders, (
        "new oracle uses INTERVAL — rewrite comparisons as epoch_us "
        f"arithmetic (see ORACLE_PORTABILITY.md): {offenders}"
    )
