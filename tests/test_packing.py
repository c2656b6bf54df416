"""Pins for operators/packing.py — concat-then-chunk sequence packing.

The pinned contract: within a shard, documents concatenate in id order
into one token stream sliced into cap-token sequences; a doc straddling
a boundary splits; a doc ending exactly on a boundary does NOT touch
the next sequence; zero-token docs occupy no stream positions.
"""

from __future__ import annotations

from parquet_sampler_spark.operators.packing import pack_sequences


def _pack(spark, rows, cap, n_shards=1):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = pack_sequences(df, "doc_id", "text", cap=cap, n_shards=n_shards)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def _words(n: int) -> str:
    return " ".join(["w"] * n)


def test_pack_boundary_exact_fill_does_not_spill(spark):
    # doc 1: 4 tokens exactly fills seq 0 (cap=4); doc 2 starts seq 1.
    got = _pack(spark, [(1, _words(4)), (2, _words(2))], cap=4)
    assert got[1]["seq_first"] == 0 and got[1]["seq_last"] == 0
    assert got[1]["n_seqs"] == 1 and got[1]["seq_offset"] == 0
    assert got[2]["seq_first"] == 1 and got[2]["seq_offset"] == 0


def test_pack_straddling_doc_splits_across_sequences(spark):
    # cap=4: doc1 has 3 tokens (seq 0, offset 0); doc2 has 6 tokens ->
    # occupies positions 3..8 = seqs 0,1,2; doc3 starts at position 9
    # (seq 2, offset 1).
    got = _pack(
        spark, [(1, _words(3)), (2, _words(6)), (3, _words(2))], cap=4
    )
    assert (got[2]["seq_first"], got[2]["seq_last"], got[2]["n_seqs"]) == (
        0, 2, 3,
    )
    assert got[2]["seq_offset"] == 3
    assert (got[3]["seq_first"], got[3]["seq_offset"]) == (2, 1)


def test_pack_zero_token_doc_excluded_and_stream_unshifted(spark):
    # doc 2 is whitespace-only: no row for it, and doc 3's position is
    # as if doc 2 never existed.
    got = _pack(spark, [(1, _words(3)), (2, "   "), (3, _words(2))], cap=4)
    assert 2 not in got
    assert (got[3]["seq_first"], got[3]["seq_offset"]) == (0, 3)


def test_pack_shards_are_independent_streams(spark):
    # n_shards=2: ids 1,3 -> shard 1; ids 2,4 -> shard 0. Each shard's
    # stream starts at its own position 0.
    rows = [(1, _words(5)), (2, _words(5)), (3, _words(2)), (4, _words(2))]
    got = _pack(spark, rows, cap=4, n_shards=2)
    assert got[1]["shard"] == 1 and got[2]["shard"] == 0
    for first in (1, 2):  # first doc of each shard
        assert (got[first]["seq_first"], got[first]["seq_offset"]) == (0, 0)
        assert got[first]["seq_last"] == 1  # 5 tokens straddle cap=4
    for second in (3, 4):  # second doc continues its own shard's stream
        assert (got[second]["seq_first"], got[second]["seq_offset"]) == (1, 1)


def test_pack_rejects_bad_params(spark):
    import pytest as _pt

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with _pt.raises(ValueError):
        pack_sequences(df, "doc_id", "text", cap=0)
    with _pt.raises(ValueError):
        pack_sequences(df, "doc_id", "text", n_shards=0)
