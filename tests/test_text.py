"""Unit tests for text-analysis functions (functions/text.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.functions import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat and it is of to in"),
        (2, "le chat est un animal et la maison de une ville en france"),
        (3, "der hund ist ein tier und die katze das auto nicht"),
        (4, "el perro es un animal y los gatos del parque una casa que"),
        (5, ""),
        (6, "zzz qqq xxx"),
        (7, "  padded   text  "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _one(df, doc_id, col):
    return df.filter(F.col("doc_id") == doc_id).collect()[0][col]


def test_token_count(docs):
    out = docs.select("doc_id", TX.token_count("text").alias("n"))
    assert _one(out, 1, "n") == 12
    assert _one(out, 5, "n") == 0
    assert _one(out, 6, "n") == 3


def test_language_id(docs):
    out = docs.select("doc_id", TX.language_id("text").alias("lang"))
    assert _one(out, 1, "lang") == "en"
    assert _one(out, 2, "lang") == "fr"
    assert _one(out, 3, "lang") == "de"
    assert _one(out, 4, "lang") == "es"
    assert _one(out, 6, "lang") == "und"


def test_stopword_ratio_bounds(docs):
    out = docs.select("doc_id", TX.stopword_ratio("text").alias("r"))
    for r in out.collect():
        assert 0.0 <= r.r <= 1.0
    assert _one(out, 6, "r") == 0.0
    assert _one(out, 5, "r") == 0.0


def test_quality_score_range(docs):
    out = docs.select("doc_id", TX.quality_score("text").alias("q"))
    for r in out.collect():
        assert 0.0 <= r.q <= 1.0
    # real-looking English text beats consonant soup
    assert _one(out, 1, "q") > _one(out, 6, "q")


def test_fingerprint_matches_java_hashcode_mod(spark):
    """The 31-base rolling hash of 'abc' is Java's hashCode: 96354."""
    df = spark.createDataFrame([(1, "abc"), (2, ""), (3, "abc")],
                               "doc_id long, text string")
    out = {r.doc_id: r.fp for r in
           df.select("doc_id", TX.fingerprint("text").alias("fp")).collect()}
    assert out[1] == 96354
    assert out[2] == 0
    assert out[1] == out[3]  # content-determined


def test_normalize_text(spark):
    from parquet_sampler_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello   WORLD\t\tfoo \n bar  ")], "id long, t string"
    )
    out = df.select(normalize_text("t").alias("c")).collect()[0].c
    assert out == "hello world foo bar"


def test_redact_pii_patterns(spark):
    from parquet_sampler_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [(1, "mail a.b+c@x-y.co.uk ip 192.168.0.1 tel 555-123-4567 ok"),
         (2, "no pii here 123 1.2 end")],
        "id long, t string",
    )
    rows = {r.id: r.c for r in
            df.select("id", redact_pii("t").alias("c")).collect()}
    assert rows[1] == "mail <EMAIL> ip <IP> tel <PHONE> ok"
    assert rows[2] == "no pii here 123 1.2 end"


def test_normalize_text_edge_whitespace_canonical(spark):
    """Edge tabs/newlines canonicalize identically to edge spaces (trim
    only strips spaces, so the collapse must run first)."""
    from parquet_sampler_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "\tHello\n"), (2, "  Hello  "), (3, "Hello")],
        "id long, t string",
    )
    vals = {r.id: r.c for r in
            df.select("id", normalize_text("t").alias("c")).collect()}
    assert vals == {1: "hello", 2: "hello", 3: "hello"}
