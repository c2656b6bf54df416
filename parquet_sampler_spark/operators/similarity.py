"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — exact brute-force top-k: pre-normalize both
  sides once (so the per-pair score is a single dot product, not a
  3-aggregate cosine), broadcast the small query side, score map-side,
  then a per-query top-k window.
* :func:`lsh_topk` — random-hyperplane LSH: bucket corpus and queries by
  sign-bit signatures and only score within matching buckets. Trades
  recall for a candidate set ~``corpus / 2^bits`` per table — the
  100 TB path where scoring everything is off the table. Recall is
  tested against the brute-force baseline (tests/test_similarity.py).
* :func:`ivf_topk` — inverted-file ANN: KMeans coarse quantizer, probe
  the nprobe nearest cells, exact rerank — the density-adaptive
  alternative to LSH.
* :func:`embedding_neardup_pairs` — all corpus pairs with cosine ≥
  threshold (brute force, oracle-checkable) — embedding-space near-dedup.

Determinism: normalization (divide by IEEE-exact sqrt) and the
left-to-right double dot product are replicated operation-for-operation
in the DuckDB oracle SQL — scores are bit-identical across engines.

Layout: inputs pass through :func:`~parquet_sampler_spark.plans.layout.
spread` — a small single-split parquet would otherwise pin all the
vector math to one core.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquet_sampler_spark.functions.vectors import cosine, norm2
from parquet_sampler_spark.plans.layout import spread

_RN = "__psx_rank"


def _normalized(df: DataFrame, id_col: str, vec_col: str,
                out_id: str, out_vec: str) -> DataFrame:
    """(id, unit-vector) relation; zero-norm vectors are dropped (their
    cosine to anything is 0 / undefined — they can never pass a positive
    threshold or outrank a real neighbor)."""
    staged = spread(df).select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).alias("__raw"),
        norm2(vec_col).alias("__nrm"),
    )
    return staged.filter(F.col("__nrm") > 0).select(
        out_id,
        F.transform(
            "__raw", lambda x: x.cast("double") / F.col("__nrm")
        ).alias(out_vec),
    )


def _unit_dot(a: str, b: str) -> Column:
    """Left-to-right double dot product of two unit vectors = cosine."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k nearest corpus rows per query row by cosine.

    Output: ``query_id, neighbor_id, score, rank`` (rank 1 = best;
    self-matches excluded when ids collide). Deterministic: ties broken
    by neighbor id.
    """
    q = _normalized(queries, id_col, vec_col, "query_id", "__qv")
    c = _normalized(corpus, id_col, vec_col, "neighbor_id", "__cv")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", _unit_dot("__qv", "__cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= k)
        .select("query_id", "neighbor_id", "score",
                F.col(_RN).alias("rank"))
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    bits: int = 4,
    tables: int = 16,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k by random-hyperplane LSH with ``tables``
    independent hash tables (union of candidates, then exact rerank).

    P(bucket match for angle θ) = (1 - θ/π)^bits per table; multiple
    tables recover recall. The band table carries only (id, table,
    signature) — vectors are joined back for the candidate pairs only,
    so the explode never multiplies vector payloads through the shuffle.
    """
    # All tables' hyperplanes as one (tables*bits, dim) matrix: the
    # per-row signature set is then a single GEMM in an Arrow-batched
    # Pandas UDF — dense linear algebra is the one place where BLAS
    # beats interpreted array lambdas by orders of magnitude. (Safe
    # here: signatures are an internal blocking key, not oracle-facing.)
    planes = np.concatenate([
        np.array(_hyperplanes(dim, bits, seed + 1000 * t))
        for t in range(tables)
    ])  # (tables*bits, dim)
    weights = (1 << np.arange(bits)).astype(np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def all_sigs(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.float64)  # (n, dim)
        signs = (m @ planes.T) > 0                   # (n, tables*bits)
        packed = signs.reshape(len(vs), tables, bits) @ weights
        return pd.Series(packed.tolist())

    def sig_rows(df: DataFrame, ident: str) -> DataFrame:
        sigs = spread(df).select(
            F.col(id_col).alias(ident), all_sigs(F.col(vec_col)).alias("__sigs")
        )
        return sigs.select(
            ident, F.posexplode("__sigs").alias("tbl", "sig")
        )

    c = sig_rows(corpus, "neighbor_id")
    q = sig_rows(queries, "query_id")
    cand = (
        c.join(F.broadcast(q), ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = _normalized(queries, id_col, vec_col, "query_id", "__qv")
    cv = _normalized(corpus, id_col, vec_col, "neighbor_id", "__cv")
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("score", _unit_dot("__qv", "__cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= k)
        .select("query_id", "neighbor_id", "score",
                F.col(_RN).alias("rank"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold (> 0) —
    embedding-space near-duplicate detection. Brute force O(n²) scoring
    over pre-normalized vectors (exact, oracle-checkable); swap in
    :func:`lsh_topk`-style blocking when the corpus outgrows it."""
    if threshold <= 0:
        raise ValueError("threshold must be positive")
    a = _normalized(df, id_col, vec_col, "id_a", "__va")
    b = _normalized(df, id_col, vec_col, "id_b", "__vb")
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", _unit_dot("__va", "__vb"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )

def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 6,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
    partitions the corpus into ``nlist`` cells; each query scores only
    the ``nprobe`` nearest cells' members, then exact cosine rerank.

    The scale shape: centroids are tiny and broadcast; corpus cell
    assignment is one map pass (done by the fitted model); the candidate
    join is an equi-join on cell id touching ~``nprobe/nlist`` of the
    corpus per query. Versus LSH: IVF adapts to the data distribution
    (cells follow density), at the cost of a training pass. Note: on
    isotropic gaussian embeddings (this testdata) there is no density
    structure to exploit and recall ≈ the probed corpus fraction plus a
    nearest-cell edge (measured 0.68 @ nprobe=6/nlist=16, 0.78 @ 8/16);
    real embedding corpora cluster and do much better.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    corpus_v = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        array_to_vector(F.col(vec_col)).alias("__features"),
    )
    km = KMeans(k=nlist, seed=seed, featuresCol="__features",
                predictionCol="__cell")
    model = km.fit(corpus_v)
    assigned = model.transform(corpus_v).select(
        "neighbor_id", "__cv", "__cell"
    )

    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vs: pd.Series) -> pd.Series:
        m = np.array(vs.tolist(), dtype=np.float64)
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        order = np.argsort(d, axis=1)[:, :nprobe]
        return pd.Series(order.astype("int32").tolist())

    q = spread(queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.explode(probe_cells(F.col(vec_col))).alias("__cell"),
    )
    cand = (
        assigned.join(F.broadcast(q), "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score", cosine("__qv", "__cv"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= k)
        .select("query_id", "neighbor_id", "score",
                F.col(_RN).alias("rank"))
    )

