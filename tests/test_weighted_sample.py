"""Weighted exact-k sampling (A-ES): determinism, weight bias, and
degenerate-weight handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.operators.sample import weighted_sample


@pytest.fixture(scope="module")
def corpus(spark):
    # ids 0..99 weight 1, ids 100..199 weight 10
    rows = [(i, 1 if i < 100 else 10) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, w long")


def test_exact_k(corpus):
    assert weighted_sample(corpus, 30, "w", ["doc_id"], seed=3).count() == 30


def test_deterministic_and_partition_invariant(corpus):
    a = weighted_sample(corpus, 25, "w", ["doc_id"], seed=5)
    b = weighted_sample(
        corpus.repartition(13), 25, "w", ["doc_id"], seed=5
    )
    ids = lambda df: sorted(r.doc_id for r in df.collect())  # noqa: E731
    assert ids(a) == ids(b)


def test_seed_changes_selection(corpus):
    ids = lambda s: sorted(  # noqa: E731
        r.doc_id
        for r in weighted_sample(corpus, 25, "w", ["doc_id"], seed=s).collect()
    )
    assert ids(1) != ids(2)


def test_heavier_rows_win_more_often(corpus):
    # weight-10 rows should dominate the sample across seeds
    heavy = 0
    total = 0
    for seed in range(10):
        got = weighted_sample(corpus, 20, "w", ["doc_id"], seed=seed)
        n_heavy = got.filter(F.col("doc_id") >= 100).count()
        heavy += n_heavy
        total += 20
    # expected heavy fraction ~ 10/11 = 0.91; require well above the
    # unweighted 0.5 with margin for a 200-row corpus
    assert heavy / total > 0.75, heavy / total


def test_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, -1), (4, None)], "doc_id long, w long"
    )
    got = weighted_sample(df, 4, "w", ["doc_id"], seed=1)
    assert [r.doc_id for r in got.collect()] == [1]


def test_k_edges(corpus):
    assert weighted_sample(corpus, 0, "w", ["doc_id"]).count() == 0
    assert weighted_sample(corpus, 10_000, "w", ["doc_id"]).count() == 200
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(corpus, -1, "w", ["doc_id"])
    with pytest.raises(ValueError, match="key_cols"):
        weighted_sample(corpus, 5, "w", [])
