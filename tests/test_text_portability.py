"""Cross-engine fuzz: every text-function SQL twin must agree with the
Spark implementation over a hostile corpus (empty strings, whitespace
runs, punctuation, digits, mixed case, long strings) — the foundation
the text oracles rest on."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from parquet_sampler_spark.functions import text as TX


def _fuzz_corpus(n=200, seed=1234):
    rng = random.Random(seed)
    words = ["the", "chat", "42", "x", "merge", "le", "und", "der",
             "query", "a", "且", "naïve", "O'Neil", "co-op"]
    corpus = ["", " ", "   ", "the", ".", "...", "a b", " padded  "]
    for _ in range(n - len(corpus)):
        k = rng.randrange(1, 30)
        toks = [rng.choice(words) for _ in range(k)]
        sep = rng.choice([" ", " ", " ", "  "])
        txt = sep.join(toks)
        if rng.random() < 0.3:
            txt = " " + txt + " "
        if rng.random() < 0.2:
            txt += rng.choice(string.punctuation)
        corpus.append(txt)
    return corpus


@pytest.fixture(scope="module")
def results(spark):
    corpus = _fuzz_corpus()
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    out = sdf.select(
        "doc_id",
        TX.token_count("text").alias("n_tok"),
        TX.token_count_bpe("text").alias("n_bpe"),
        TX.stopword_ratio("text").alias("stop"),
        TX.language_id("text").alias("lang"),
        TX.quality_score("text").alias("q"),
        TX.fingerprint("text").alias("fp"),
    )
    spark_rows = {r.doc_id: r for r in out.collect()}

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (SELECT unnest(range(0, ?)) "
        "AS doc_id)", [len(corpus)]
    )
    con.execute("ALTER TABLE docs ADD COLUMN text VARCHAR")
    for i, t in enumerate(corpus):
        con.execute("UPDATE docs SET text = ? WHERE doc_id = ?", [t, i])
    sql = (
        f"SELECT doc_id, {TX.token_count_sql('text')} AS n_tok, "
        f"{TX.token_count_bpe_sql('text')} AS n_bpe, "
        f"{TX.stopword_ratio_sql('text')} AS stop, "
        f"{TX.language_id_sql('text')} AS lang, "
        f"{TX.quality_score_sql('text')} AS q, "
        f"{TX.fingerprint_sql('text')} AS fp FROM docs"
    )
    duck_rows = {r[0]: r for r in con.execute(sql).fetchall()}
    return corpus, spark_rows, duck_rows


@pytest.mark.parametrize("field,idx", [
    ("n_tok", 1), ("n_bpe", 2), ("stop", 3), ("lang", 4), ("q", 5),
    ("fp", 6),
])
def test_text_fn_cross_engine(results, field, idx):
    corpus, spark_rows, duck_rows = results
    mismatches = [
        (i, corpus[i], spark_rows[i][field], duck_rows[i][idx])
        for i in spark_rows
        if spark_rows[i][field] != duck_rows[i][idx]
    ]
    assert not mismatches, mismatches[:5]


def test_mixed_string_hash_cross_engine(spark):
    """mixed_string_hash (the SimHash token hash) must agree with its
    SQL twin — and actually use its high bits (the diffusion property
    the raw rolling hash lacks for short tokens)."""
    from parquet_sampler_spark.functions.hashing import (
        mixed_string_hash,
        mixed_string_hash_sql,
    )

    toks = ["", "a", "x", "42", "the", "naïve", "O'Neil", "且",
            "longertoken", "co-op", " ", "Zz9"]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "i long, tok string"
    )
    got = {
        r.i: r.h
        for r in sdf.select("i", mixed_string_hash("tok").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, tok VARCHAR)")
    for i, t in enumerate(toks):
        con.execute("INSERT INTO t VALUES (?, ?)", [i, t])
    want = {
        r[0]: r[1]
        for r in con.execute(
            f"SELECT i, {mixed_string_hash_sql('tok')} FROM t"
        ).fetchall()
    }
    assert got == want
    # diffusion: every nonempty short token must light up high bits —
    # the raw rolling hash keeps them < 2^16 and SimHash bands go dead
    short = [got[i] for i, t in enumerate(toks) if t.strip() and len(t) <= 2]
    assert short and all(h >= (1 << 24) for h in short), short


def test_mixed_string_hash_wild_unicode_fuzz(spark):
    """300 seeded random strings over a deliberately hostile alphabet —
    ASCII, latin-1, CJK, combining marks, astral-plane emoji/Gothic,
    NUL, DEL — must hash identically in Spark and DuckDB. The simhash
    oracle's validity reduces to exactly this agreement."""
    import random

    from parquet_sampler_spark.functions.hashing import (
        mixed_string_hash,
        mixed_string_hash_sql,
    )

    rng = random.Random(99)
    alphabet = [chr(c) for c in list(range(32, 127))
                + [0xE9, 0x4E14, 0x1F600, 0x301, 0x10348, 0x0, 0x7F]]
    toks = ["".join(rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 12)))
            for _ in range(300)]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "i long, tok string"
    )
    got = {r.i: r.h for r in
           sdf.select("i", mixed_string_hash("tok").alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE wild (i BIGINT, tok VARCHAR)")
    for i, t in enumerate(toks):
        con.execute("INSERT INTO wild VALUES (?, ?)", [i, t])
    want = {r[0]: r[1] for r in con.execute(
        f"SELECT i, {mixed_string_hash_sql('tok')} FROM wild"
    ).fetchall()}
    assert got == want
