"""bm25_topk (r12): fixed-point Okapi BM25 retrieval."""

import pytest


def _bm25(spark, rows, terms, **kw):
    from parquet_sampler_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = bm25_topk(df, "doc_id", "text", terms, **kw)
    return [(r.doc_id, r.dl, r.n_hit_terms, r.score_scaled)
            for r in out.collect()]


def test_bm25_hand_trace_two_terms(spark):
    # N=3, T=15. df(q)=2 -> idf = (1000*(2*1+1)) DIV 5 = 600;
    # df(a)=1 -> idf = (1000*(2*2+1)) DIV 3 = 1666.
    # doc1 (dl=3): q tf=2 -> (600*44*15*2) DIV (600+90+162) = 929
    #              a tf=1 -> (1666*44*15*1) DIV (300+90+162) = 1991
    # doc2 (dl=10): q tf=1 -> (600*44*15*1) DIV (300+90+540) = 425
    # doc3: no hit -> absent.
    rows = [
        (1, "q q a"),
        (2, "q b b b b b b b b b"),
        (3, "x y"),
    ]
    got = _bm25(spark, rows, ["q", "a"], scale=1000)
    assert got == [(1, 3, 2, 929 + 1991), (2, 10, 1, 425)]


def test_bm25_length_normalization_and_tf_saturation(spark):
    # same tf, longer doc scores strictly lower; doubling tf raises
    # the score but sub-linearly (Okapi saturation)
    rows = [
        (1, "t f1 f2 f3"),
        (2, "t g1 g2 g3 g4 g5 g6 g7 g8 g9"),
        (3, "t t h1 h2"),
    ]
    got = dict(
        (d, s) for d, _, _, s in _bm25(spark, rows, ["t"], scale=10_000)
    )
    assert got[1] > got[2]           # length normalization
    assert got[3] > got[1]           # more tf wins at similar dl
    assert got[3] < 2 * got[1]       # ...sub-linearly


def test_bm25_topk_limit_and_tiebreak(spark):
    # 5 identical docs tie exactly: k=3 must keep the smallest ids
    rows = [(i, "t pad") for i in range(1, 6)]
    got = _bm25(spark, rows, ["t"], k=3)
    assert [d for d, *_ in got] == [1, 2, 3]
    assert len({s for *_, s in got}) == 1


def test_bm25_validation(spark):
    from parquet_sampler_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [], k=1)
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ["a"], k=0)
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ["a"], scale=0)
