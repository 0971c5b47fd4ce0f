"""WCC / LPA / triangle-count correctness — mirrors the reference's
structural-equality and exact-count gates
(``tests/components/test_connectivity.py:316-342``,
``tests/community/test_triangle_count.py:73-102``)."""

import networkx as nx
import pytest

from conftest import karate_edges, seeded_graph, two_component_graph

from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators.lpa import label_propagation
from cugraph_spark.operators.triangles import triangle_count, total_triangles
from cugraph_spark.operators.wcc import weakly_connected_components


def _build(spark, edges, directed=True, n=8):
    df = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges], "src LONG, dst LONG"
    )
    return LinkGraph.from_edges(df, directed=directed, num_partitions=n)


def _nx_graph(edges):
    g = nx.Graph()
    g.add_edges_from(edges)
    return g


# ------------------------------------------------------------------------ WCC
@pytest.mark.parametrize("shortcut", [True, False])
def test_wcc_two_components(spark, shortcut):
    edges = two_component_graph()
    g = _build(spark, edges)
    got = {
        r["vertex"]: r["labels"]
        for r in weakly_connected_components(g, shortcutting=shortcut).collect()
    }
    nx_comps = list(nx.connected_components(_nx_graph(edges)))
    assert len(set(got.values())) == len(nx_comps) == 2
    # exact component membership (canonical label = min external id)
    for comp in nx_comps:
        labels = {got[v] for v in comp}
        assert labels == {min(comp)}
    g.unpersist()


def test_wcc_chain_and_isolated_paths(spark):
    # long path graph exercises shortcutting; hub-and-chain mix
    edges = [(i, i + 1) for i in range(30)] + [(100, 101)]
    g = _build(spark, edges)
    got = {r["vertex"]: r["labels"] for r in weakly_connected_components(g).collect()}
    assert {got[i] for i in range(31)} == {0}
    assert got[100] == got[101] == 100
    g.unpersist()


def test_wcc_directed_uses_underlying_undirected(spark):
    # directed a->b, c->b : weakly connected as one component
    edges = [(0, 1), (2, 1)]
    g = _build(spark, edges)
    got = {r["vertex"]: r["labels"] for r in weakly_connected_components(g).collect()}
    assert set(got.values()) == {0}
    g.unpersist()


def test_wcc_parallelism_invariance(spark):
    edges = seeded_graph(80, 150, seed=11)
    g2 = _build(spark, edges, n=2)
    g8 = _build(spark, edges, n=8)
    r2 = sorted(weakly_connected_components(g2).collect())
    r8 = sorted(weakly_connected_components(g8).collect())
    assert r2 == r8
    g2.unpersist()
    g8.unpersist()


# ------------------------------------------------------------------------ LPA
def test_lpa_two_cliques(spark):
    # two 5-cliques joined by one bridge edge: LPA must separate them
    cl1 = [(a, b) for a in range(5) for b in range(5) if a < b]
    cl2 = [(a + 10, b + 10) for a, b in cl1]
    edges = cl1 + cl2 + [(0, 10)]
    g = _build(spark, edges)
    got = {r["vertex"]: r["label"] for r in label_propagation(g, max_iter=30).collect()}
    labs1 = {got[v] for v in range(5)}
    labs2 = {got[v + 10] for v in range(5)}
    assert len(labs1) == 1 and len(labs2) == 1 and labs1 != labs2


def test_lpa_deterministic_across_parallelism(spark):
    edges = seeded_graph(60, 140, seed=5)
    g2 = _build(spark, edges, n=2)
    g8 = _build(spark, edges, n=8)
    r2 = sorted(label_propagation(g2, max_iter=10).collect())
    r8 = sorted(label_propagation(g8, max_iter=10).collect())
    assert r2 == r8
    g2.unpersist()
    g8.unpersist()


def test_lpa_pair_does_not_oscillate(spark):
    # mutually-linked page pair: self-inclusive voting must converge the two
    # vertices to one label (min id) instead of swapping forever
    edges = [(20, 21), (21, 20)]
    g = _build(spark, edges, n=2)
    got = {r["vertex"]: r["label"] for r in label_propagation(g, max_iter=10).collect()}
    assert got == {20: 20, 21: 20}
    g.unpersist()


def test_lpa_isolated_vertex_keeps_label(spark):
    df = spark.sparkContext.parallelize([(0, 1), (1, 0)]).toDF(["src", "dst"])
    g = LinkGraph.from_edges(df, directed=True, num_partitions=2)
    got = {r["vertex"]: r["label"] for r in label_propagation(g, max_iter=5).collect()}
    assert set(got) == {0, 1}


# ------------------------------------------------------------------ triangles
def test_triangles_karate_exact(spark, karate_df):
    g = LinkGraph.from_edges(karate_df, directed=False, num_partitions=8)
    got = {r["vertex"]: r["counts"] for r in triangle_count(g).collect()}
    expect = nx.triangles(nx.karate_club_graph())
    assert got == {k: v for k, v in expect.items()}
    g.unpersist()


def test_triangles_seeded_exact(spark):
    edges = seeded_graph(100, 400, seed=9)
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=False, num_partitions=8)
    got = {r["vertex"]: r["counts"] for r in triangle_count(g).collect()}
    expect = nx.triangles(_nx_graph(edges))
    assert got == expect
    assert total_triangles(g) == sum(expect.values()) // 3
    g.unpersist()


def test_triangles_rejects_directed(spark, karate_df):
    g = LinkGraph.from_edges(karate_df, directed=True, num_partitions=8)
    with pytest.raises(ValueError):
        triangle_count(g)
    g.unpersist()


def test_triangles_self_loops_excluded(spark):
    edges = [(0, 1), (1, 2), (0, 2), (1, 1)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=False, num_partitions=2)
    got = {r["vertex"]: r["counts"] for r in triangle_count(g).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
    g.unpersist()
