"""PageRank correctness vs the reference update rule (numpy oracle) —
mirrors ``tests/link_analysis/test_pagerank.py:157-212`` (allclose gate)."""

import numpy as np
import pytest

from conftest import karate_edges, pagerank_oracle, seeded_graph

from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators.pagerank import pagerank


def _build(spark, edges, directed=True):
    df = spark.createDataFrame([(int(s), int(d)) for s, d in edges], "src LONG, dst LONG")
    return LinkGraph.from_edges(df, directed=directed, num_partitions=8)


def _check(result_df, oracle, tol=1e-6):
    got = {r["vertex"]: r["pagerank"] for r in result_df.collect()}
    assert set(got) == set(oracle)
    for v in oracle:
        assert abs(got[v] - oracle[v]) <= tol, (v, got[v], oracle[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_karate(spark, karate_df):
    g = LinkGraph.from_edges(karate_df, directed=True, num_partitions=8)
    res = pagerank(g, alpha=0.85, tol=1e-6, max_iter=500)
    assert res.converged
    oracle = pagerank_oracle(karate_edges(), tol=1e-8, max_iter=1000)
    _check(res.ranks, oracle)
    g.unpersist()


def test_pagerank_dangling(spark):
    # a directed graph with sinks: dangling-mass redistribution must kick in
    edges = [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (4, 0)]  # 3 is a sink
    g = _build(spark, edges)
    res = pagerank(g, tol=1e-8, max_iter=500)
    oracle = pagerank_oracle(edges, tol=1e-10, max_iter=2000)
    _check(res.ranks, oracle, tol=1e-7)
    g.unpersist()


def test_pagerank_personalization(spark):
    edges = seeded_graph(50, 120, seed=3)
    g = _build(spark, edges)
    pers_map = {0: 0.7, 5: 0.2, 10: 0.1}
    pers = spark.createDataFrame(list(pers_map.items()), "vertex LONG, values DOUBLE")
    res = pagerank(g, personalization=pers, tol=1e-8, max_iter=500)
    oracle = pagerank_oracle(edges, tol=1e-10, max_iter=2000, personalization=pers_map)
    _check(res.ranks, oracle, tol=1e-7)
    g.unpersist()


def test_pagerank_nstart_converges_same(spark, karate_df):
    g = LinkGraph.from_edges(karate_df, directed=True, num_partitions=8)
    nstart = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(34)], "vertex LONG, values DOUBLE"
    )
    res = pagerank(g, tol=1e-10, max_iter=1000, nstart=nstart)
    oracle = pagerank_oracle(karate_edges(), tol=1e-10, max_iter=2000)
    _check(res.ranks, oracle, tol=1e-7)
    g.unpersist()


def test_pagerank_nonconvergence_raises(spark, karate_df):
    g = LinkGraph.from_edges(karate_df, directed=True, num_partitions=8)
    with pytest.raises(RuntimeError):
        pagerank(g, tol=1e-12, max_iter=2, fail_on_nonconvergence=True)
    g.unpersist()


def test_pagerank_parallelism_invariance(spark, karate_df):
    """local[2]-style vs local[8]-style partitioning must give identical
    results (SURVEY §5.2 item 4 — the SG-vs-MG analog)."""
    g2 = LinkGraph.from_edges(karate_df, directed=True, num_partitions=2)
    g8 = LinkGraph.from_edges(karate_df, directed=True, num_partitions=8)
    r2 = {r["vertex"]: r["pagerank"] for r in pagerank(g2, tol=1e-8, max_iter=500).ranks.collect()}
    r8 = {r["vertex"]: r["pagerank"] for r in pagerank(g8, tol=1e-8, max_iter=500).ranks.collect()}
    for v in r2:
        assert np.isclose(r2[v], r8[v], atol=1e-12)
    g2.unpersist()
    g8.unpersist()


def test_pagerank_fused_bit_identical(spark):
    """fuse=k chains k supersteps into one materialization with dangling
    mass derived from the sink-flow recurrence; results must match the
    exact single-step path bit-for-bit (pagerank.py docstring contract),
    including on a graph WITH dangling vertices."""
    edges = seeded_graph(60, 150, seed=7) + [(1, 59), (2, 58)]
    # drop all out-edges of a few vertices to force sinks in the directed view
    edges = [(s, d) for s, d in edges if s not in (58, 59)]
    g = _build(spark, edges)
    exact = {
        r["vertex"]: r["pagerank"]
        for r in pagerank(g, tol=0.0, max_iter=9, fuse=1,
                          fail_on_nonconvergence=False).ranks.collect()
    }
    for k in (3, 4):
        fused = {
            r["vertex"]: r["pagerank"]
            for r in pagerank(g, tol=0.0, max_iter=9, fuse=k,
                              fail_on_nonconvergence=False).ranks.collect()
        }
        assert set(fused) == set(exact)
        for v in exact:
            assert fused[v] == exact[v], (k, v, fused[v], exact[v])
    g.unpersist()
