"""Round-trip tests for the beyond-Parquet sources/sinks."""

from __future__ import annotations

import pytest

from parquet_sampler_spark.sources import formats as FX


@pytest.fixture(scope="module")
def small(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)],
        "id long, s string, v double",
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_csv_roundtrip(spark, small, tmp_path):
    p = str(tmp_path / "csv")
    FX.write_csv(small, p)
    back = FX.read_csv(spark, p, schema="id long, s string, v double")
    assert _sorted_rows(back) == _sorted_rows(small)


def test_json_roundtrip(spark, small, tmp_path):
    p = str(tmp_path / "json")
    FX.write_json(small, p)
    back = FX.read_json(spark, p, schema="id long, s string, v double")
    assert _sorted_rows(back) == _sorted_rows(small)


def test_orc_roundtrip(spark, small, tmp_path):
    p = str(tmp_path / "orc")
    FX.write_orc(small, p)
    back = FX.read_orc(spark, p)
    assert back.schema == small.schema
    assert _sorted_rows(back) == _sorted_rows(small)


def test_convert_to_parquet_partitioned(spark, small, tmp_path):
    src = str(tmp_path / "src_csv")
    dst = str(tmp_path / "dst_parquet")
    FX.write_csv(small.fillna({"s": "x"}), src)
    FX.convert_to_parquet(spark, src, dst, in_format="csv",
                          schema="id long, s string, v double",
                          partition_by=["s"])
    back = spark.read.parquet(dst)
    assert back.count() == 3
    # hive-partitioned layout: s=<value> directories exist
    from pathlib import Path

    assert any(d.name.startswith("s=") for d in Path(dst).iterdir()
               if d.is_dir())


def test_convert_rejects_unknown_format(spark, tmp_path):
    with pytest.raises(ValueError):
        FX.convert_to_parquet(spark, "/x", str(tmp_path / "o"),
                              in_format="avro")


def test_partition_pruning_on_partitioned_output(spark, small, tmp_path):
    """Reading a hive-partitioned dataset with a partition filter must
    prune at the scan (PartitionFilters in the plan) — the layout that
    makes 100 TB tables queryable by slice."""
    dst = str(tmp_path / "part_out")
    src = str(tmp_path / "src2")
    FX.write_csv(small.fillna({"s": "x"}), src)
    FX.convert_to_parquet(spark, src, dst, in_format="csv",
                          schema="id long, s string, v double",
                          partition_by=["s"])
    from pyspark.sql import functions as F

    df = spark.read.parquet(dst).filter(F.col("s") == "a")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(s" in plan or "(s" in plan
    assert df.count() == 1


def test_merge_schema_read_null_fills_old_files(spark, tmp_path):
    """Schema-on-read evolution: a file written before a column
    existed and one written after must read back as one relation with
    mergeSchema, old rows null-filled — and column pruning must still
    serve a v1-only projection without touching the new column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "evo"
    d.mkdir()
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "s": pa.array(["a", "b"])}),
        str(d / "v1.parquet"),
    )
    pq.write_table(
        pa.table({"id": pa.array([3], pa.int64()),
                  "s": pa.array(["c"]),
                  "extra": pa.array([9.5], pa.float64())}),
        str(d / "v2.parquet"),
    )
    got = sorted(map(tuple, (
        spark.read.option("mergeSchema", "true").parquet(str(d))
        .select("id", "s", "extra").collect()
    )))
    assert got == [(1, "a", None), (2, "b", None), (3, "c", 9.5)]
    # pruned projection over the mixed-schema dir still works
    ids = sorted(r.id for r in spark.read.option("mergeSchema", "true")
                 .parquet(str(d)).select("id").collect())
    assert ids == [1, 2, 3]
