"""Pins for operators/sample.py mixture_resample — DoReMi-style
domain-mixture downsampling.

Pinned contract: the source scarcest relative to its weight is kept
WHOLE; every other source is hash-thinned so expected kept-token shares
match the target weights; thresholds are exact integers; keep/drop is
recomputable from the id alone (repartition-invariant).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.operators.sample import mixture_resample


def _corpus(spark, spec):
    # spec: {source: (n_docs, tokens_per_doc)}; ids are globally unique
    rows, nid = [], 0
    for src in sorted(spec):
        n, tpd = spec[src]
        for _ in range(n):
            rows.append((nid, " ".join(["w"] * tpd), src))
            nid += 1
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )


def test_binding_source_kept_whole(spark):
    # b is scarcest relative to its weight (100 tokens, weight 3 ->
    # 33.3 vs a's 1000/1=1000): every b row must survive.
    df = _corpus(spark, {"a": (100, 10), "b": (10, 10)})
    out = mixture_resample(df, "doc_id", "text", "source",
                           {"a": 1, "b": 3}, seed=7)
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert by_src.get("b") == 10
    assert 0 < by_src.get("a", 0) < 100


def test_kept_mixture_tracks_target(spark):
    # equal corpora, target 3:1 -> kept tokens should be ~3:1 (hash
    # sampling: allow a generous band around expectation).
    df = _corpus(spark, {"a": (400, 10), "b": (400, 10)})
    out = mixture_resample(df, "doc_id", "text", "source",
                           {"a": 3, "b": 1}, seed=11)
    toks = {r["source"]: r["t"] for r in
            out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()}
    assert toks["a"] == 4000  # binding source (scarcest per weight unit)
    ratio = toks["a"] / toks["b"]
    assert 2.2 < ratio < 4.2  # expectation 3, hash-binomial noise band


def test_unweighted_and_empty_sources_dropped(spark):
    df = _corpus(spark, {"a": (20, 5), "c": (20, 5)})
    out = mixture_resample(df, "doc_id", "text", "source",
                           {"a": 1, "b": 1}, seed=3)
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert srcs == {"a"}  # c unweighted, b absent from corpus


def test_partitioning_invariance(spark):
    df = _corpus(spark, {"a": (150, 8), "b": (50, 8)})
    w = {"a": 1, "b": 2}
    kept1 = {r["doc_id"] for r in
             mixture_resample(df, "doc_id", "text", "source", w, seed=5)
             .collect()}
    kept2 = {r["doc_id"] for r in
             mixture_resample(df.repartition(13), "doc_id", "text",
                              "source", w, seed=5).collect()}
    assert kept1 == kept2 and kept1


def test_bad_params_raise(spark):
    df = _corpus(spark, {"a": (2, 3)})
    with pytest.raises(ValueError):
        mixture_resample(df, "doc_id", "text", "source", {})
    with pytest.raises(ValueError):
        mixture_resample(df, "doc_id", "text", "source", {"a": 0})
    with pytest.raises(ValueError):
        mixture_resample(df, "doc_id", "text", "source", {"zz": 1})
