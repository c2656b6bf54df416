"""Lexical retrieval over the document corpus.

The reference engine (andreaskipf/parquet-sampler) has no retrieval
surface — this module is part of the beyond-reference LLM-pipeline
scope: corpus search is how a curation pipeline finds contamination,
audits near-misses of a benchmark query, or mines domain exemplars
for DSIR-style selection.

Everything follows the repo's exact-arithmetic convention: BM25's
transcendental idf is replaced by a fixed-point integer surrogate
monotone in the same argument, so Spark and the DuckDB oracle agree
bit-for-bit (see operators/quality.py for the convention's rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-``k`` documents by fixed-point BM25 (Robertson/Okapi,
    k1 = 1.2, b = 0.75) for a bag of query terms.

    Exact-rational formulation: with ``T`` total corpus tokens, ``N``
    docs and ``dl`` the document length, the Okapi term quotient

        tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),   avgdl = T/N

    multiplied through by ``20·T`` becomes the integer ratio
    ``44·T·tf / (20·T·tf + 6·T + 18·N·dl)`` — every quantity exact in
    integers. The idf uses the RSJ-monotone fixed-point surrogate
    ``(scale · (2(N − df) + 1)) DIV (2·df + 1)`` (the +1 halves are
    the classic 0.5 smoothing doubled into integers; monotone in the
    true ``ln``-idf argument, transcendental-free — the
    tfidf_topk convention). Per-term score = ``(idf_scaled · 44·T·tf)
    DIV (20·T·tf + 6·T + 18·N·dl)`` computed in DECIMAL(38,0) (the
    triple product exceeds bigint at web scale; ≤ 10^33 at N = 10^9,
    T = 10^13 — inside 38 digits), truncated per term THEN summed —
    the defined statistic, replicated exactly in the oracle's
    HUGEINT arithmetic.

    Output: ``(id_col, dl, n_hit_terms, score_scaled)`` for the top
    ``k`` by ``(score_scaled DESC, id ASC)``.

    Plan shape (the 100 TB contract): corpus stats (N, T) come from
    ONE tiny aggregate over a per-row ``dl`` expression (no token
    explode); the term-frequency table explodes tokens but FILTERS to
    the query terms BEFORE the (id, tok) aggregation shuffles — rows
    ∝ query-term occurrences, never corpus tokens; ``dl`` rides the
    groupBy key (functionally dependent on the id), so no corpus-side
    join anywhere; the ≤|Q|-row df table broadcasts; top-k is
    orderBy+limit (TakeOrderedAndProject — never a global sort).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    from parquet_sampler_spark.functions.text import token_count
    from parquet_sampler_spark.plans.layout import spread

    base = spread(df).select(
        F.col(id_col), token_count(text_col).alias("dl")
    ).filter(F.col("dl") > 0)
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("__N"),
        F.sum("dl").cast("bigint").alias("__T"),
    )
    t = F.trim(F.col(text_col))
    qtf = (
        spread(df)
        .filter(t.isNotNull() & (F.length(t) > 0))
        .select(
            F.col(id_col),
            token_count(text_col).alias("dl"),
            F.explode(F.split(t, " ")).alias("tok"),
        )
        .filter(F.col("tok").isin(*query_terms))
        .groupBy(id_col, "dl", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = qtf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("__df")
    )
    term = (
        qtf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            "dl",
            F.expr(
                f"CAST(({scale} * (2 * (__N - __df) + 1)) DIV "
                f"(2 * __df + 1) AS DECIMAL(38, 0))"
            ).alias("__idf"),
            F.col("tf"),
            F.col("__N"),
            F.col("__T"),
        )
        .select(
            F.col(id_col),
            "dl",
            F.expr(
                "CAST((__idf * 44 * CAST(__T AS DECIMAL(38, 0)) * tf) DIV "
                "(20 * CAST(__T AS DECIMAL(38, 0)) * tf + 6 * __T "
                "+ 18 * CAST(__N AS DECIMAL(38, 0)) * dl) AS BIGINT)"
            ).alias("__s"),
        )
    )
    scored = term.groupBy(id_col, "dl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit_terms"),
        F.sum("__s").cast("bigint").alias("score_scaled"),
    )
    return scored.orderBy(
        F.col("score_scaled").desc(), F.col(id_col).asc()
    ).limit(k)
