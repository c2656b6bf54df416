"""Pins for operators/similarity.py semantic_dedup — SemDeDup-style
cluster-then-dedup (Abbas et al. 2023).

Pinned contract: only WITHIN-cell pairs are compared; of any pair with
cosine >= tau the higher id drops (min-id keeper); cross-cell near-dups
are the documented miss class; zero-norm vectors are never dropped.
"""

from __future__ import annotations

import math

import pytest

from parquet_sampler_spark.operators.similarity import semantic_dedup

# two well-separated directions in 4-d; nlist=2 puts them in two cells
_E1 = [1.0, 0.0, 0.0, 0.0]
_E2 = [0.0, 1.0, 0.0, 0.0]


def _near(base, eps):
    # a vector eps-rotated off `base` toward the last axis: cosine to
    # base is 1/sqrt(1+eps^2), e.g. eps=0.1 -> 0.995
    v = list(base)
    v[3] = eps
    return v


def _dedup(spark, rows, **kw):
    df = spark.createDataFrame(rows, "vec_id bigint, v array<double>")
    out = semantic_dedup(df, "vec_id", "v", **kw)
    return {r["vec_id"]: r["cell"] for r in out.collect()}


def test_within_cell_near_dup_drops_higher_id(spark):
    # ids 1,2 nearly parallel (cos ~0.995 >= tau) and land in the same
    # cell; id 10 is the other direction. Survivors: 1 (min id) and 10.
    rows = [(1, _E1), (2, _near(_E1, 0.1)), (10, _E2)]
    kept = _dedup(spark, rows, nlist=2, tau=0.92, seed=7)
    assert set(kept) == {1, 10}


def test_genuinely_distinct_within_cell_both_kept(spark):
    # cos(e1, 45-degree blend) ~ 0.707 < tau: same-cell but distinct.
    s = 1 / math.sqrt(2)
    rows = [(1, _E1), (2, [s, 0.0, s, 0.0]), (10, _E2)]
    kept = _dedup(spark, rows, nlist=2, tau=0.92, seed=7)
    assert set(kept) == {1, 2, 10}


def test_chain_collapses_to_min_id(spark):
    # 1~2 and 2~3 and 1~3 all above tau in one cell: only 1 survives
    # (2 drops via 1, 3 drops via 1 and 2).
    rows = [(1, _E1), (2, _near(_E1, 0.05)), (3, _near(_E1, 0.1)),
            (10, _E2)]
    kept = _dedup(spark, rows, nlist=2, tau=0.92, seed=7)
    assert set(kept) == {1, 10}


def test_zero_norm_vector_never_dropped(spark):
    rows = [(1, _E1), (2, _near(_E1, 0.1)), (5, [0.0, 0.0, 0.0, 0.0]),
            (10, _E2)]
    kept = _dedup(spark, rows, nlist=2, tau=0.92, seed=7)
    assert 5 in kept and set(kept) == {1, 5, 10}


def test_identical_vector_drops_regardless_of_cell_count(spark):
    # exact re-ingest (the registry row's injection pattern): identical
    # quantized ints -> identical cell, cosine exactly computed on the
    # same unit vector -> dropped at any tau <= 1.
    rows = [(1, _E1), (1_000_000, _E1), (10, _E2), (11, _E2)]
    kept = _dedup(spark, rows, nlist=2, tau=1.0, seed=3)
    assert 1 in kept and 1_000_000 not in kept
    assert 10 in kept and 11 not in kept


def test_bad_tau_raises(spark):
    rows = [(1, _E1)]
    with pytest.raises(ValueError):
        _dedup(spark, rows, nlist=2, tau=0.0)


def test_pandas_and_expr_paths_identical(spark):
    # registry-like corpus: real embeddings + exact re-ingests
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .selectExpr("vec_id", "embedding as v")
    inj = e.filter("vec_id % 5 = 0") \
        .selectExpr("vec_id + 1000000000 as vec_id", "v")
    corpus = e.unionByName(inj)
    kw = dict(nlist=8, tau=0.92, seed=13)
    a = semantic_dedup(corpus, "vec_id", "v", pairs="pandas", **kw)
    b = semantic_dedup(corpus, "vec_id", "v", pairs="expr", **kw)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb and len(ra) == 500  # all 100 injections dropped



def test_two_level_fit_deterministic_and_sized():
    import numpy as np

    from parquet_sampler_spark.operators.similarity import (
        _TWO_LEVEL_NLIST,
        _fit_coarse_centroids,
        _lloyd_kmeans,
    )

    rng = np.random.default_rng(123)
    X = rng.standard_normal((5000, 16))
    # at or below the threshold: exactly the flat Lloyd fit
    flat = _lloyd_kmeans(X, 32, 7, 10)
    assert np.array_equal(_fit_coarse_centroids(X, 32, 7, 10), flat)
    # above: two-level — deterministic, ~k cells, right width
    a = _fit_coarse_centroids(X, 128, 7, 10)
    b = _fit_coarse_centroids(X, 128, 7, 10)
    assert np.array_equal(a, b)
    assert a.shape[1] == 16
    assert 64 < a.shape[0] <= 140  # ~k, never wildly off


def test_two_level_paths_still_value_identical(spark):
    # pandas vs expr equality again, now through the two-level fit
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .selectExpr("vec_id", "embedding as v")
    kw = dict(nlist=80, tau=0.92, seed=13)
    a = semantic_dedup(e, "vec_id", "v", pairs="pandas", **kw)
    b = semantic_dedup(e, "vec_id", "v", pairs="expr", **kw)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
