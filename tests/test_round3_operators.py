"""Round-3 API parity: MultiGraph semantics (graph_classes.py:795-823),
hits(nstart) (link_analysis/hits.py:25-124), triangle_count(start_list)
(community/triangle_count.py:45-122), digest-based exact_dedup."""

from __future__ import annotations

import networkx as nx
import pytest
from conftest import karate_edges
from pyspark.sql import functions as F

from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import hits, triangle_count
from cugraph_spark import text as tx


@pytest.fixture(scope="module")
def karate_undirected(spark):
    rows = [(int(s), int(d)) for s, d in karate_edges()]
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=False, renumber=True)
    yield g
    g.unpersist()


# ---------------------------------------------------------------- MultiGraph
def test_multigraph_preserves_parallel_edges(spark):
    # 3 parallel (0,1) edges + one (1,2)
    rows = [(0, 1, 1.0), (0, 1, 2.0), (0, 1, 3.0), (1, 2, 9.0)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, w DOUBLE")

    mg = LinkGraph.from_edges(df, weight="w", directed=True, multigraph=True)
    assert mg.is_multigraph()
    assert mg.number_of_edges() == 4  # parallel edges preserved
    # parallel-edge weights NOT min-collapsed
    ws = sorted(
        r["weight"]
        for r in mg.view_edge_list()
        .filter((F.col("src") == 0) & (F.col("dst") == 1))
        .collect()
    )
    assert ws == [1.0, 2.0, 3.0]

    # plain graph on the same input min-collapses (symmetrize.py:86-89)
    g = LinkGraph.from_edges(df, weight="w", directed=True)
    assert not g.is_multigraph()
    assert g.number_of_edges() == 2
    w = (
        g.view_edge_list()
        .filter((F.col("src") == 0) & (F.col("dst") == 1))
        .collect()[0]["weight"]
    )
    assert w == 1.0
    mg.unpersist()
    g.unpersist()


def test_multigraph_undirected_keeps_parallel(spark):
    rows = [(0, 1, 1.0), (0, 1, 2.0)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, w DOUBLE")
    mg = LinkGraph.from_edges(df, weight="w", directed=False, multigraph=True)
    # reverse union without dedup: 2 parallel x 2 directions
    assert mg.number_of_edges() == 4
    assert mg.is_multigraph()
    mg.unpersist()


def test_multigraph_density_raises(spark):
    df = spark.createDataFrame([(0, 1)], "src LONG, dst LONG")
    mg = LinkGraph.from_edges(df, directed=True, multigraph=True)
    with pytest.raises(TypeError):
        mg.density()
    g = LinkGraph.from_edges(df, directed=True)
    assert g.density() == pytest.approx(0.5)  # 1 edge / (2*1)
    mg.unpersist()
    g.unpersist()


def test_multigraph_roundtrip_direction(spark):
    rows = [(0, 1, 1.0), (0, 1, 2.0)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, w DOUBLE")
    mg = LinkGraph.from_edges(df, weight="w", directed=True, multigraph=True)
    und = mg.to_undirected()
    assert und.is_multigraph()
    assert not und.properties.directed
    mg.unpersist()
    und.unpersist()


# -------------------------------------------------------------- hits(nstart)
def test_hits_nstart_converges_to_same_fixpoint(spark, karate_undirected):
    g = karate_undirected
    base = {
        r["vertex"]: r["hubs"]
        for r in hits(g, max_iter=200, tol=1e-9).collect()
    }
    # skewed start: vertex 0 gets all the initial mass
    ns = spark.createDataFrame([(0, 100.0)], "vertex LONG, values DOUBLE")
    seeded = {
        r["vertex"]: r["hubs"]
        for r in hits(g, max_iter=200, tol=1e-9, nstart=ns).collect()
    }
    assert set(base) == set(seeded)
    for v in base:
        assert seeded[v] == pytest.approx(base[v], abs=1e-5)


# ---------------------------------------------------- triangles(start_list)
def test_triangle_count_start_list(spark, karate_undirected):
    g = karate_undirected
    full = {
        r["vertex"]: r["counts"]
        for r in triangle_count(g).collect()
    }
    nxg = nx.Graph(list(karate_edges()))
    nx_tri = nx.triangles(nxg)
    assert full == {v: nx_tri[v] for v in full}

    sub = triangle_count(g, start_list=[0, 5, 33]).collect()
    assert {r["vertex"] for r in sub} == {0, 5, 33}
    for r in sub:
        assert r["counts"] == full[r["vertex"]]

    one = triangle_count(g, start_list=0).collect()
    assert len(one) == 1 and one[0]["counts"] == full[0]

    with pytest.raises(TypeError):
        triangle_count(g, start_list="zero")


# ------------------------------------------------------- exact_dedup digest
def test_exact_dedup_digest_groups(spark):
    rows = [
        (1, "the same text"),
        (2, "the same text"),
        (7, "the same text"),
        (3, "unique one"),
        (4, "another unique"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r["dup_count"] for r in tx.exact_dedup(docs).collect()}
    assert out == {1: 3, 3: 1, 4: 1}
