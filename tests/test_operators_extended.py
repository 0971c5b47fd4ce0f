"""Tests for traversal / similarity / centrality / cores / structure
operators against NetworkX & numpy oracles on the karate fixture
(the reference's own test strategy, SURVEY §5.1)."""

from __future__ import annotations

import math

import networkx as nx
import pytest
from pyspark.sql import functions as F

from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import (
    bfs,
    core_number,
    degree_centrality,
    eigenvector_centrality,
    ego_graph,
    hits,
    induced_subgraph,
    jaccard,
    k_core,
    katz_centrality,
    overlap,
    sorensen,
    sssp,
    two_hop_neighbors,
    uniform_neighbor_sample,
)

from conftest import karate_edges


@pytest.fixture(scope="module")
def karate_graph(spark):
    rows = [(int(s), int(d)) for s, d in karate_edges()]
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=True, renumber=True)
    yield g
    g.unpersist()


@pytest.fixture(scope="module")
def nx_karate():
    return nx.karate_club_graph()


def test_bfs_distances(karate_graph, nx_karate):
    got = {
        r["vertex"]: r["distance"]
        for r in bfs(karate_graph, 0).collect()
    }
    want = nx.single_source_shortest_path_length(nx_karate, 0)
    assert got == dict(want)


def test_sssp_unit_weights(karate_graph, nx_karate):
    got = {
        r["vertex"]: r["distance"] for r in sssp(karate_graph, 0).collect()
    }
    want = nx.single_source_shortest_path_length(nx_karate, 0)
    assert got == {k: float(v) for k, v in want.items()}


def test_jaccard_vs_networkx(karate_graph, nx_karate):
    rows = jaccard(karate_graph).collect()
    got = {(min(r.first, r.second), max(r.first, r.second)): r.jaccard_coeff for r in rows}
    for (u, v), coeff in got.items():
        want = next(iter(nx.jaccard_coefficient(nx_karate, [(u, v)])))[2]
        assert abs(coeff - want) < 1e-12, (u, v)


def test_overlap_sorensen_consistency(karate_graph):
    j = {(r.first, r.second): r.jaccard_coeff for r in jaccard(karate_graph).collect()}
    o = {(r.first, r.second): r.overlap_coeff for r in overlap(karate_graph).collect()}
    s = {(r.first, r.second): r.sorensen_coeff for r in sorensen(karate_graph).collect()}
    assert set(j) == set(o) == set(s)
    for k in j:
        # sorensen = 2J/(1+J); overlap >= jaccard
        assert abs(s[k] - 2 * j[k] / (1 + j[k])) < 1e-12
        assert o[k] >= j[k] - 1e-12


def test_degree_centrality(karate_graph, nx_karate):
    got = {
        r["vertex"]: r["degree_centrality"]
        for r in degree_centrality(karate_graph).collect()
    }
    # our graph is the directed symmetric expansion: in+out = 2*undirected deg
    want = {v: 2 * d / (34 - 1) for v, d in nx_karate.degree()}
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12


def _adjacency(nx_g):
    import numpy as np

    n = nx_g.number_of_nodes()
    A = np.zeros((n, n))
    for u, v in nx_g.edges():
        A[u, v] = 1.0
        A[v, u] = 1.0
    return A


def test_hits_vs_numpy_oracle(karate_graph, nx_karate):
    """Numpy oracle implementing the reference HITS update exactly
    (hits_impl.cuh:118-156): auth ← Aᵀ·hub; hub ← A·auth (UNnormalized
    auth); max-normalize both; final sum-normalize."""
    import numpy as np

    A = _adjacency(nx_karate)
    n = A.shape[0]
    hub = np.full(n, 1.0 / n)
    for _ in range(200):
        auth = A.T @ hub
        hub_new = A @ auth
        hub_new = hub_new / hub_new.max()
        auth = auth / auth.max()
        if np.abs(hub_new - hub).sum() < 1e-10:
            hub = hub_new
            break
        hub = hub_new
    hub /= hub.sum()
    auth /= auth.sum()

    rows = hits(karate_graph, max_iter=200, tol=1e-10).collect()
    got_h = {r["vertex"]: r["hubs"] for r in rows}
    got_a = {r["vertex"]: r["authorities"] for r in rows}
    for v in range(n):
        assert abs(got_h[v] - hub[v]) < 1e-6, v
        assert abs(got_a[v] - auth[v]) < 1e-6, v


def test_eigenvector_vs_numpy_oracle(karate_graph, nx_karate):
    import numpy as np

    A = _adjacency(nx_karate)
    n = A.shape[0]
    x = np.full(n, 1.0 / n)
    for _ in range(500):
        nxt = A.T @ x
        nxt = nxt / np.linalg.norm(nxt)
        if np.abs(nxt - x).sum() < 1e-10:
            x = nxt
            break
        x = nxt
    rows = eigenvector_centrality(karate_graph, max_iter=500, tol=1e-9).collect()
    got = {r["vertex"]: r["eigenvector_centrality"] for r in rows}
    for v in range(n):
        assert abs(got[v] - x[v]) < 1e-5, v


def test_katz_vs_networkx(karate_graph, nx_karate):
    alpha = 0.05
    rows = katz_centrality(
        karate_graph, alpha=alpha, beta=1.0, max_iter=300, tol=1e-10
    ).collect()
    got = {r["vertex"]: r["katz_centrality"] for r in rows}
    want = nx.katz_centrality(nx_karate, alpha=alpha, beta=1.0, max_iter=2000, tol=1e-12)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-5, v


def test_core_number(karate_graph, nx_karate):
    got = {
        r["vertex"]: r["core_number"] for r in core_number(karate_graph).collect()
    }
    want = nx.core_number(nx_karate)
    assert got == want


def test_k_core_edges(karate_graph, nx_karate):
    got = k_core(karate_graph, 4)
    got_pairs = {
        (min(r.src, r.dst), max(r.src, r.dst)) for r in got.collect()
    }
    want = {
        (min(u, v), max(u, v)) for u, v in nx.k_core(nx_karate, 4).edges()
    }
    assert got_pairs == want


def test_two_hop(karate_graph, nx_karate):
    got = {(r.first, r.second) for r in two_hop_neighbors(karate_graph).collect()}
    want = set()
    for u in nx_karate.nodes():
        for m in nx_karate.neighbors(u):
            for w in nx_karate.neighbors(m):
                if u != w:
                    want.add((u, w))
    assert got == want


def test_induced_subgraph(spark, karate_graph, nx_karate):
    keep = [0, 1, 2, 3, 4, 5, 6, 7]
    vdf = spark.createDataFrame([(v,) for v in keep], "vertex LONG")
    got = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in induced_subgraph(karate_graph, vdf).collect()
    }
    want = {
        (min(u, v), max(u, v))
        for u, v in nx_karate.subgraph(keep).edges()
    }
    assert got == want


def test_ego_graph(spark, karate_graph, nx_karate):
    got = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in ego_graph(karate_graph, 33, radius=1).collect()
    }
    want = {
        (min(u, v), max(u, v))
        for u, v in nx.ego_graph(nx_karate, 33, radius=1).edges()
    }
    assert got == want


def test_uniform_neighbor_sample(spark, karate_graph):
    starts = spark.createDataFrame([(0,), (33,)], "v LONG")
    out = uniform_neighbor_sample(karate_graph, starts, [2, 2]).collect()
    hops = {}
    for r in out:
        hops.setdefault(r.hop_id, []).append((r.sources, r.destinations))
    # fanout respected per source
    for hop, pairs in hops.items():
        per_src = {}
        for s, d in pairs:
            per_src.setdefault(s, set()).add(d)
        for s, ds in per_src.items():
            assert len(ds) <= 2
    # hop-0 sources are exactly the start vertices that have out-edges
    assert {s for s, _ in hops[0]} <= {0, 33}
    # every sampled edge exists
    edges = {(r.src, r.dst) for r in karate_graph.unrenumber(
        karate_graph.unrenumber(karate_graph.edges.select("src", "dst"), "src"), "dst"
    ).collect()}
    for pairs in hops.values():
        for s, d in pairs:
            assert (s, d) in edges
