"""Cross-engine fuzz for the vector formulas: random embeddings
(including zero vectors, negatives, denormal-ish magnitudes) must score
bit-identically in Spark and DuckDB — the foundation of the
similarity-search oracles."""

from __future__ import annotations

import random

import duckdb
import pytest

from parquet_sampler_spark.functions.vectors import (
    dot_sql,
    norm2_sql,
)


@pytest.fixture(scope="module")
def vectors():
    rng = random.Random(77)
    vecs = [
        [0.0] * 8,                                   # zero vector
        [1.0] + [0.0] * 7,                           # unit axis
        [-1e-30] * 8,                                # tiny magnitudes
        [1e15, -1e15, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0],  # cancellation
    ]
    for _ in range(60):
        vecs.append([rng.uniform(-10, 10) for _ in range(8)])
    return vecs


def test_dot_and_norm_cross_engine(spark, vectors):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vectors)]
    sdf = spark.createDataFrame(rows, "vid long, v array<float>")

    from parquet_sampler_spark.functions.vectors import dot, norm2

    got = {
        r.vid: (r.d, r.n)
        for r in sdf.select(
            "vid", dot("v", "v").alias("d"), norm2("v").alias("n")
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t(vid BIGINT, v FLOAT[])")
    for i, v in rows:
        con.execute("INSERT INTO t VALUES (?, ?)", [i, v])
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT vid, {dot_sql('v', 'v')}, {norm2_sql('v')} FROM t"
        ).fetchall()
    }
    mismatches = [(i, got[i], want[i]) for i in got if got[i] != want[i]]
    assert not mismatches, mismatches[:3]
