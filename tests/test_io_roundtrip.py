"""Schema/type round-trip tests (SURVEY.md §5.4): read → sample → write →
re-read preserves schema, nullability, and values for the six
reference-supported types (§1.3) AND types the reference panics on
(lib.rs:122-124) — timestamp, decimal, binary, array — which we support
natively."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from parquet_sampler_spark.operators.sample import sample_exact
from parquet_sampler_spark.sources.io import (
    metadata_row_count,
    read_parquet,
    write_parquet,
)

ALLTYPES_SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("c_bool", T.BooleanType(), True),
    T.StructField("c_int32", T.IntegerType(), True),
    T.StructField("c_int64", T.LongType(), True),
    T.StructField("c_float", T.FloatType(), True),
    T.StructField("c_double", T.DoubleType(), True),
    T.StructField("c_string", T.StringType(), True),
])

BEYOND_SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("c_ts", T.TimestampType(), True),
    T.StructField("c_dec", T.DecimalType(12, 2), True),
    T.StructField("c_bin", T.BinaryType(), True),
    T.StructField("c_arr", T.ArrayType(T.FloatType()), True),
])


@pytest.fixture(scope="module")
def alltypes(spark):
    rows = [
        (i,
         None if i % 10 == 0 else i % 2 == 0,
         None if i % 10 == 1 else i,
         None if i % 10 == 2 else i * 10**10,
         None if i % 10 == 3 else float(i) / 3,
         None if i % 10 == 4 else i / 7.0,
         None if i % 10 == 5 else f"s{i}")
        for i in range(1000)
    ]
    return spark.createDataFrame(rows, ALLTYPES_SCHEMA)


def test_alltypes_roundtrip(spark, alltypes, tmp_path):
    out = str(tmp_path / "alltypes")
    s = sample_exact(alltypes, 0.1, seed=9, key_cols=["k"])
    write_parquet(s, out)
    back = read_parquet(spark, out)
    # Spark's parquet reader reports every column nullable (unlike the
    # reference, which round-trips OPTIONAL/REQUIRED via the printed
    # schema, lib.rs:19-24) — compare names+types, values pin the rest.
    assert [(f.name, f.dataType) for f in back.schema] == \
        [(f.name, f.dataType) for f in ALLTYPES_SCHEMA]
    assert back.count() == 100
    orig = {r.k: r for r in s.collect()}
    for r in back.collect():
        assert orig[r.k] == r


def test_beyond_reference_types_roundtrip(spark, tmp_path):
    """Types the reference write path panics on (lib.rs:122-124)."""
    rows = [
        (i,
         None if i % 20 == 0 else datetime.datetime(2024, 1, 1 + i % 28),
         None if i % 20 == 1 else Decimal(f"{i}.25"),
         None if i % 20 == 2 else bytes([i % 256, 255 - i % 256]),
         None if i % 20 == 3 else [float(i), float(i) * 0.5])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, BEYOND_SCHEMA)
    s = sample_exact(df, 0.5, seed=2, key_cols=["k"])
    out = str(tmp_path / "beyond")
    write_parquet(s, out)
    back = read_parquet(spark, out)
    assert [(f.name, f.dataType) for f in back.schema] == \
        [(f.name, f.dataType) for f in BEYOND_SCHEMA]
    assert back.count() == 100


def test_single_file_output(spark, alltypes, tmp_path):
    out = str(tmp_path / "single")
    write_parquet(alltypes, out, single_file=True)
    from pathlib import Path

    files = list(Path(out).glob("*.parquet"))
    assert len(files) == 1
    assert metadata_row_count(out) == 1000


def test_metadata_count_matches(spark):
    path = "/root/testdata/sf0.001/lineitem.parquet"
    assert metadata_row_count(path) == read_parquet(spark, path).count()


def test_projected_read_prunes_scan(spark):
    df = read_parquet(spark, "/root/testdata/sf0.001/lineitem.parquet",
                      columns=["l_orderkey"])
    assert df.columns == ["l_orderkey"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "l_partkey" not in plan  # column pruned out of the scan


def test_compact_parquet_reduces_files(spark, tmp_path):
    """64 tiny files → compaction produces the byte-sized file count
    with identical data."""
    from parquet_sampler_spark.sources.io import compact_parquet

    src = str(tmp_path / "shattered")
    spark.range(10_000).repartition(64).write.parquet(src)
    import pathlib
    n_in = len(list(pathlib.Path(src).glob("*.parquet")))
    assert n_in == 64

    out = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, src, out, target_mb=128)
    assert n_out == 1  # 10k longs ≪ 128 MB
    files = list(pathlib.Path(out).glob("*.parquet"))
    assert len(files) == 1
    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(10_000))


def test_cluster_by_range_enables_file_skipping(spark, tmp_path):
    """Range-clustered files carry narrow, pairwise-disjoint min/max
    column ranges (the property parquet row-group skipping needs);
    an unclustered round-robin write has every file spanning the full
    domain."""
    import pyarrow.parquet as pq
    import pathlib

    from parquet_sampler_spark.plans.layout import cluster_by_range

    df = spark.range(100_000).selectExpr(
        "id AS k", "CAST(id % 97 AS DOUBLE) AS v"
    )

    def ranges(path):
        out = []
        for f in sorted(pathlib.Path(path).glob("*.parquet")):
            md = pq.read_metadata(f)
            los, his = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)  # k
                los.append(col.statistics.min)
                his.append(col.statistics.max)
            out.append((min(los), max(his)))
        return out

    messy = str(tmp_path / "messy")
    df.repartition(8).write.parquet(messy)
    clustered = str(tmp_path / "clustered")
    cluster_by_range(df, ["k"], 8).write.parquet(clustered)

    def overlaps(rs):
        rs = sorted(rs)
        return sum(
            1 for (a, b) in zip(rs, rs[1:]) if a[1] >= b[0]
        )

    assert overlaps(ranges(messy)) > 0        # every file spans ~all
    assert overlaps(ranges(clustered)) == 0   # disjoint ranges
