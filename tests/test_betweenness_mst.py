"""Betweenness centrality (batched Brandes) and MST (Borůvka) tests."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from conftest import karate_edges
from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import betweenness_centrality, minimum_spanning_tree


@pytest.fixture(scope="module")
def karate_graph(spark):
    rows = [(int(s), int(d)) for s, d in karate_edges()]
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=True, renumber=True)
    yield g
    g.unpersist()


def test_betweenness_all_sources(karate_graph):
    got = {
        r["vertex"]: r["betweenness_centrality"]
        for r in betweenness_centrality(karate_graph, normalized=True).collect()
    }
    # our graph is the symmetric digraph; nx on the DiGraph matches exactly
    want = nx.betweenness_centrality(
        nx.karate_club_graph().to_directed(), normalized=True
    )
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, v


def test_betweenness_sampled_is_approximate(karate_graph):
    got = {
        r["vertex"]: r["betweenness_centrality"]
        for r in betweenness_centrality(karate_graph, k=16, normalized=True).collect()
    }
    want = nx.betweenness_centrality(
        nx.karate_club_graph().to_directed(), normalized=True
    )
    # sampled: correct to sampling error; the top hub lands in the true top-3
    top_got = max(got, key=got.get)
    want_top3 = sorted(want, key=want.get, reverse=True)[:3]
    assert top_got in want_top3
    assert len(got) == 34


def test_mst_weighted(spark):
    # weighted graph with a unique MST
    edges = [
        (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.5), (3, 0, 4.0),
        (0, 2, 5.0), (1, 3, 0.5), (4, 5, 1.0), (3, 4, 2.5),
    ]
    both = edges + [(b, a, w) for a, b, w in edges]
    df = spark.createDataFrame(both, "src LONG, dst LONG, weight DOUBLE")
    g = LinkGraph.from_edges(df, weight="weight", directed=False)
    # canonical (a,b) order is internal-id based; normalize for comparison
    got = {
        (min(r.src, r.dst), max(r.src, r.dst)): r.weight
        for r in minimum_spanning_tree(g).collect()
    }
    nxg = nx.Graph()
    nxg.add_weighted_edges_from(edges)
    want = {
        (min(u, v), max(u, v)): d["weight"]
        for u, v, d in nx.minimum_spanning_tree(nxg).edges(data=True)
    }
    assert got == want
    g.unpersist()


def test_mst_unweighted_is_spanning_forest(karate_graph):
    out = minimum_spanning_tree(karate_graph).collect()
    # spanning tree of a connected graph: V-1 edges, acyclic, spans
    assert len(out) == 33
    nxg = nx.Graph((r.src, r.dst) for r in out)
    assert nx.is_forest(nxg)
    assert nxg.number_of_nodes() == 34
