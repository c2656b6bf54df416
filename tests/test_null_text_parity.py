"""NULL-text cross-engine parity pins (r09 review findings).

The gate corpus has no NULL text, so these divergences were invisible
to the oracle sweep: Spark's ``size(split(NULL))`` is -1 where SQL
``len`` is NULL (corrupting token sums), and ``fp NOT IN (...)``
drops NULL-fingerprint rows (or everything, if the bench side holds a
NULL) where the engine keeps them. Both contracts are now explicit —
NULL text counts 0 tokens and is never a contamination candidate —
and this file runs engine and oracle side by side on a corpus WITH
NULLs to keep them pinned.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def null_doc_dir(spark, tmp_path_factory):
    """A documents.parquet with NULL/empty text rows in both the bench
    cut (doc_id < 20) and the training cut."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nulldocs")
    rows = []
    for i in range(60):
        if i in (3, 41):
            text = None
        elif i in (7, 45):
            text = "   "
        else:
            text = f"tok{i % 9} " * (3 + i % 5) + "tail"
        rows.append((i, text, "en", f"src{i % 4}", len(text or "")))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_token_count_null_is_zero_both_engines(spark, null_doc_dir):
    from parquet_sampler_spark.functions.text import (
        token_count,
        token_count_sql,
    )

    got = _rows(
        spark.read.parquet(f"{null_doc_dir}/documents.parquet")
        .select("doc_id", token_count("text").alias("n"))
    )
    want = _oracle(
        f"SELECT doc_id, {token_count_sql('text')} AS n FROM documents",
        null_doc_dir,
    )
    assert sorted(got) == sorted(want)
    by_id = dict(got)
    assert by_id[3] == 0 and by_id[7] == 0  # NULL and whitespace-only


def test_bloom_decontaminate_null_text_parity(spark, null_doc_dir, monkeypatch):
    # monkeypatch restores the env var — a bare os.environ write leaked
    # into later tests, pointing the ANN oracle builders at a docs-only
    # tmp dir (FileNotFoundError on embeddings.parquet)
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", null_doc_dir)
    from parquet_sampler_spark.queries_ext import (
        _q_bloom_decontaminate,
        _sql_bloom_decontaminate,
    )

    got = _rows(_q_bloom_decontaminate(spark, null_doc_dir))
    want = _oracle(_sql_bloom_decontaminate(), null_doc_dir)
    assert sorted(map(str, got)) == sorted(map(str, want))
    # the NULL-text training row survives in both engines
    kept_ids = {r[0] for r in got}
    assert 41 in kept_ids


def test_mixture_resample_null_text_parity(spark, null_doc_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", null_doc_dir)
    from parquet_sampler_spark.operators.sample import mixture_resample

    d = spark.read.parquet(f"{null_doc_dir}/documents.parquet")
    weights = {"src0": 3, "src1": 1, "src2": 2, "src3": 1}
    got = _rows(
        mixture_resample(d, "doc_id", "text", "source", weights, seed=29)
    )
    # oracle twin built from the registry helper with the same weights
    from parquet_sampler_spark import queries_ext as QE

    saved = QE._MIX_WEIGHTS
    try:
        QE._MIX_WEIGHTS = weights
        sql = QE._sql_mixture_resample()
    finally:
        QE._MIX_WEIGHTS = saved
    want = _oracle(sql, null_doc_dir)
    assert sorted(map(str, got)) == sorted(map(str, want)) and got
