"""Pins for operators/vocab.py bpe_merge_rounds — BPE trainer loop.

Pinned contract: every adjacent position counts (runs count overlaps);
winner = max count, ties to the lexicographically smallest pair;
rewrite merges greedily leftmost-first non-overlapping in token space
("a b a b" merges BOTH, "a a a" merges only the first); later rounds
see merged symbols as ordinary tokens.
"""

from __future__ import annotations

import pytest

from parquet_sampler_spark.operators.vocab import bpe_merge_rounds


def _merges(spark, texts, rounds):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    return [tuple(r) for r in
            bpe_merge_rounds(df, "doc_id", "text", rounds=rounds).collect()]


def test_canonical_three_round_trace(spark):
    got = _merges(spark, ["a b a b c", "a b x", "a a a"], 3)
    # r1: 'a b' appears 3x (both doc0 occurrences + doc1) and BOTH
    # doc0 occurrences merge; r2: the run 'a a a' counts (a,a) twice;
    # r3: four pairs tie at 1, 'a_a a' is lexicographically smallest
    assert got == [
        (1, "a b", "a_b", 3),
        (2, "a a", "a_a", 2),
        (3, "a_a a", "a_a_a", 1),
    ]


def test_run_merges_leftmost_only(spark):
    got = _merges(spark, ["a a a a"], 2)
    # round 1 counts 3 adjacent (a,a); rewrite -> 'a_a a_a' (leftmost
    # non-overlapping); round 2's winner is then (a_a, a_a)
    assert got[0] == (1, "a a", "a_a", 3)
    assert got[1] == (2, "a_a a_a", "a_a_a_a", 1)


def test_tie_breaks_to_smallest_pair(spark):
    got = _merges(spark, ["b c", "a d"], 1)
    assert got == [(1, "a d", "a_d", 1)]


def test_empty_and_single_token_docs_ignored(spark):
    got = _merges(spark, ["", "   ", "solo", "x y"], 1)
    assert got == [(1, "x y", "x_y", 1)]


def test_merged_symbol_feeds_later_rounds(spark):
    got = _merges(spark, ["p q r", "p q r", "p q s"], 2)
    assert got[0] == (1, "p q", "p_q", 3)
    assert got[1] == (2, "p_q r", "p_q_r", 2)


def test_bad_rounds_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        bpe_merge_rounds(df, "doc_id", "text", rounds=0)


def test_no_pairs_returns_empty_merge_table(spark):
    got = _merges(spark, ["solo", "another"], 3)
    assert got == []
