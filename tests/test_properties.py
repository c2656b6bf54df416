"""Property-based tests (hypothesis): cross-engine portability of the
hash formulas — the foundation the oracle determinism rests on — and
sampler invariants over arbitrary ratios."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from parquet_sampler_spark.functions.hashing import (
    MODULUS,
    lehmer_hash_sql,
    _seed_params,
)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**7),
                  min_size=1, max_size=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=200, deadline=None)
def test_lehmer_hash_python_vs_duckdb(keys, seed):
    """The SQL rendering evaluated by DuckDB must equal a direct Python
    evaluation of the same formula for arbitrary keys/seeds (both must
    stay inside exact int64 arithmetic)."""
    sm, sa = _seed_params(seed)
    expr = lehmer_hash_sql(["k"], seed)
    got = [
        r[0]
        for r in duckdb.sql(
            f"SELECT {expr} FROM (SELECT unnest({keys}) AS k)"
        ).fetchall()
    ]
    want = [((k * 48271) % MODULUS * sm + sa) % MODULUS for k in keys]
    assert got == want


@given(seed=st.integers(min_value=0, max_value=2**40))
@settings(max_examples=100, deadline=None)
def test_seed_params_valid(seed):
    sm, sa = _seed_params(seed)
    assert 0 < sm < MODULUS
    assert 0 <= sa < MODULUS


@given(
    n=st.integers(min_value=0, max_value=5000),
    ratio=st.floats(min_value=0.0, max_value=1.0,
                    allow_nan=False, allow_infinity=False),
)
@settings(max_examples=50, deadline=None)
def test_sample_size_formula(n, ratio):
    """floor(n·ratio) ∈ [0, n] for every valid ratio — the size contract
    the sampler promises (sample.rs:37 semantics, minus the hang)."""
    k = int(math.floor(n * ratio))
    assert 0 <= k <= n


def test_spark_lehmer_matches_duckdb_on_data(spark):
    """End-to-end: Spark's lehmer_hash column equals DuckDB's rendering
    of lehmer_hash_sql over the same parquet keys."""
    from parquet_sampler_spark.functions.hashing import lehmer_hash

    path = "/root/testdata/sf0.001/orders.parquet"
    sdf = spark.read.parquet(path).select(
        "o_orderkey", lehmer_hash(["o_orderkey"], 123).alias("h")
    )
    got = {r.o_orderkey: r.h for r in sdf.collect()}
    expr = lehmer_hash_sql(["o_orderkey"], 123)
    want = dict(duckdb.sql(
        f"SELECT o_orderkey, {expr} FROM '{path}'"
    ).fetchall())
    assert got == want


def test_sampler_cross_engine_fuzz(spark):
    """The flagship contract, fuzzed: for random (ratio, seed) pairs the
    Spark sampler and the equivalent DuckDB SQL select the IDENTICAL
    row set on the same parquet."""
    import random

    from parquet_sampler_spark.operators.sample import sample_exact

    path = "/root/testdata/sf0.001/orders.parquet"
    df = spark.read.parquet(path)
    n = df.count()
    rng = random.Random(2024)
    for _ in range(8):
        ratio = rng.choice([0.001, 0.01, 0.037, 0.2, 0.5, 0.999])
        seed = rng.randrange(0, 2**31)
        s = sample_exact(df, ratio, seed=seed, key_cols=["o_orderkey"],
                         total_rows=n)
        got = sorted(r.o_orderkey for r in s.select("o_orderkey").collect())
        pr = lehmer_hash_sql(["o_orderkey"], seed)
        want = sorted(r[0] for r in duckdb.sql(f"""
            SELECT o_orderkey FROM (
              SELECT o_orderkey,
                     row_number() OVER (ORDER BY {pr}, o_orderkey) AS rn
              FROM '{path}')
            WHERE rn <= CAST(floor({n} * {ratio}) AS BIGINT)
        """).fetchall())
        assert got == want, (ratio, seed, len(got), len(want))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 20)),
        min_size=0, max_size=200,
    ),
    st.integers(2, 12),
)
def test_misra_gries_undercount_bound(stream, k):
    """The MG guarantee heavy_hitters' superset argument rests on:
    after any weighted stream, every key's counter undercounts its
    true weight by at most total/(cap+1) with cap=k-1 counters — so a
    key with zero counter has true weight <= total/k, and a globally
    heavy key must survive in at least one partition summary."""
    from parquet_sampler_spark.operators.sketches import _mg_update

    counters: dict = {}
    true: dict = {}
    total = 0
    for key, w in stream:
        _mg_update(counters, key, w, k - 1)
        true[key] = true.get(key, 0) + w
        total += w
        assert len(counters) <= k - 1
    for key, t in true.items():
        est = counters.get(key, 0)
        assert est <= t, (key, est, t)
        assert t - est <= total / k, (key, est, t, total, k)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1, max_size=300,
        ),
        min_size=1, max_size=6,
    ),
    st.integers(4, 64),
    st.floats(0.0, 1.0),
)
def test_quantile_summary_rank_error_bound(partitions, cap, p):
    """The mergeable-quantile guarantee quantile_rollup rests on,
    checked in pure numpy (no Spark — the kernel math is identical):
    after summarizing each partition with a rank-grid of size <= cap
    and answering quantile p by weighted rank over the merged
    summaries, the estimate's true rank differs from p by at most
    sum_parts(n_part/(2*cap + something small)) + discretization —
    asserted here as 1/(2*cap) of each partition's rows plus one
    grid cell, i.e. total rank slack <= sum(ceil(n_i/cap)) + 1."""
    import numpy as np

    all_vals = np.sort(np.concatenate([
        np.array(pp, dtype=np.float64) for pp in partitions
    ]))
    n_total = len(all_vals)

    kept_vals, kept_ws = [], []
    slack = 0.0
    for pp in partitions:
        v = np.sort(np.array(pp, dtype=np.float64))
        n = len(v)
        if n <= cap:
            kept_vals.append(v)
            kept_ws.append(np.ones(n))
        else:
            idx = np.floor((np.arange(cap) + 0.5) * n / cap).astype(int)
            kept_vals.append(v[idx])
            kept_ws.append(np.full(cap, n / cap))
            slack += n / cap  # one grid cell of rank uncertainty
    vals = np.concatenate(kept_vals)
    ws = np.concatenate(kept_ws)
    order = np.argsort(vals, kind="stable")
    vals, ws = vals[order], ws[order]
    cum = np.cumsum(ws)
    j = int(np.searchsorted(cum, p * cum[-1], side="left"))
    j = min(j, len(vals) - 1)
    est = vals[j]

    # true rank window of the estimate in the full data
    lo = np.searchsorted(all_vals, est, side="left") / n_total
    hi = np.searchsorted(all_vals, est, side="right") / n_total
    allowed = (slack + 1.0) / n_total
    assert lo - allowed <= p <= hi + allowed, (
        p, est, lo, hi, allowed, cap,
    )


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1, max_size=400,
        ),
        min_size=1, max_size=5,
    ),
    st.integers(4, 48),
    st.floats(0.0, 1.0),
)
def test_weighted_grid_two_level_rank_error_bound(partitions, cap, p):
    """The r08 partition-local quantile build rests on the SAME kernel
    at two levels: _weighted_grid compresses each partition's values,
    then compresses the union of the per-partition summaries again
    (the phase-2 merge). Checked in pure numpy with the real kernel:
    every compression that actually compresses is charged one full
    grid cell of the weight it covers (generous: the bound is half a
    cell), and the final weighted-rank answer must sit within the
    accumulated slack of the true rank."""
    import numpy as np

    from parquet_sampler_spark.operators.sketches import _weighted_grid

    all_vals = np.sort(np.concatenate([
        np.array(pp, dtype=np.float64) for pp in partitions
    ]))
    n_total = len(all_vals)

    slack = 0.0
    kept_vals, kept_ws = [], []
    for pp in partitions:
        v = np.array(pp, dtype=np.float64)
        kv, kw = _weighted_grid(v, np.ones(len(v)), cap)
        if len(v) > cap:
            slack += len(v) / min(cap, len(v))  # one grid cell
        kept_vals.append(kv)
        kept_ws.append(np.full(len(kv), kw))
    vals = np.concatenate(kept_vals)
    ws = np.concatenate(kept_ws)
    # level 2: the phase-2 merge compress
    fv, fw = _weighted_grid(vals, ws, cap)
    if len(vals) > cap:
        slack += ws.sum() / min(cap, len(vals))
    cum = np.cumsum(np.full(len(fv), fw))
    j = int(np.searchsorted(cum, p * cum[-1], side="left"))
    j = min(j, len(fv) - 1)
    est = fv[j]

    lo = np.searchsorted(all_vals, est, side="left") / n_total
    hi = np.searchsorted(all_vals, est, side="right") / n_total
    allowed = (slack + fw) / n_total  # + final grid discretization
    assert lo - allowed <= p <= hi + allowed, (
        p, est, lo, hi, allowed, cap,
    )
