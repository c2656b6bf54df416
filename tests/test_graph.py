"""Integer fixed-point PageRank: structural invariants on a known
graph, determinism, and validation errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_sampler_spark.operators.graph import pagerank

SCALE = 10**9
BASE = 15 * SCALE // 100  # damping 85


@pytest.fixture(scope="module")
def triangle_plus_isolated(spark):
    # undirected triangle 1-2-3 plus isolated node 9
    e = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    edges = spark.createDataFrame(e, "src long, dst long")
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "id long")
    return edges, nodes


def test_pagerank_triangle_symmetry_and_isolated(triangle_plus_isolated):
    edges, nodes = triangle_plus_isolated
    pr = {r.id: r.pr for r in pagerank(edges, nodes=nodes).collect()}
    assert set(pr) == {1, 2, 3, 9}
    # symmetric triangle: identical scores, above the isolated node
    assert pr[1] == pr[2] == pr[3]
    # isolated node receives nothing: exactly the base term
    assert pr[9] == BASE
    assert pr[1] > pr[9]
    # triangle scores stay near the initial mass (floor losses only):
    # each iteration maps scale -> base + 85% of scale
    assert 0.9 * SCALE < pr[1] <= SCALE


def test_pagerank_deterministic(triangle_plus_isolated):
    edges, nodes = triangle_plus_isolated
    a = sorted(map(tuple, pagerank(edges, nodes=nodes).collect()))
    b = sorted(map(tuple, pagerank(edges, nodes=nodes).collect()))
    assert a == b


def test_pagerank_validation(triangle_plus_isolated):
    edges, nodes = triangle_plus_isolated
    with pytest.raises(ValueError):
        pagerank(edges, damping_pct=0)
    with pytest.raises(ValueError):
        pagerank(edges, num_iterations=0)


def test_pagerank_reliable_checkpoint_dir(triangle_plus_isolated, tmp_path):
    """checkpoint_dir selects reliable checkpoint() over
    localCheckpoint(): identical scores, and RDD checkpoint files
    actually land in the fault-tolerant dir."""
    edges, nodes = triangle_plus_isolated
    ckpt = str(tmp_path / "ckpt")
    fast = {r.id: r.pr for r in pagerank(edges, nodes=nodes).collect()}
    reliable = {
        r.id: r.pr
        for r in pagerank(
            edges, nodes=nodes, checkpoint_dir=ckpt
        ).collect()
    }
    assert fast == reliable
    import os

    written = []
    for root, _dirs, files in os.walk(ckpt):
        written.extend(os.path.join(root, f) for f in files)
    assert written, "no checkpoint files written to checkpoint_dir"


def test_cluster_dedup_best_keeps_argmax_quality(spark):
    # chain a-b-c is one cluster; best-quality wins, ties -> min id
    from pyspark.sql import functions as F

    from parquet_sampler_spark.operators.dedup import (
        cluster_dedup,
        cluster_dedup_best,
    )

    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id bigint, q double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    best = sorted(
        r["doc_id"]
        for r in cluster_dedup_best(df, pairs, "doc_id", "q").collect()
    )
    # cluster {1,2,3}: max q 0.9 tie between 2 and 3 -> 2;
    # singletons 4 and 9 survive untouched
    assert best == [2, 4, 9]
    minid = sorted(
        r["doc_id"] for r in cluster_dedup(df, pairs, "doc_id").collect()
    )
    assert minid == [1, 4, 9]


# ---------------------------------------------------------------------------
# triangle_counts (r12): cliquishness of the duplicate graph
# ---------------------------------------------------------------------------


def _tri(spark, node_ids, edges):
    from parquet_sampler_spark.operators.graph import triangle_counts

    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.doc_id: r.triangles
            for r in triangle_counts(nodes, pairs, "doc_id").collect()}


def test_triangles_clique_vs_chain(spark):
    # 4-clique on 1-4: C(3,2)=3 triangles per node; chain 10-11-12:
    # zero; isolated 20: zero
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(10, 11), (11, 12)]
    got = _tri(spark, [1, 2, 3, 4, 10, 11, 12, 20], clique + chain)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 10: 0, 11: 0, 12: 0, 20: 0}


def test_triangles_counted_once_per_orientation(spark):
    # single triangle 1-2-3 plus a pendant edge 3-4: each triangle
    # node credited exactly once, pendant stays 0
    got = _tri(spark, [1, 2, 3, 4], [(1, 2), (1, 3), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}


def test_triangles_two_shared_edge(spark):
    # triangles 1-2-3 and 2-3-4 share edge (2,3): shared nodes get 2
    got = _tri(spark, [1, 2, 3, 4],
               [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}
