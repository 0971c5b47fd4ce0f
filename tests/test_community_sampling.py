"""Tests for k-truss, SCC, random walks / node2vec, PropertyGraph, and
hypergraph builder."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from conftest import karate_edges
from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import (
    biased_random_walks,
    k_truss,
    node2vec,
    random_walks,
    strongly_connected_components,
)
from cugraph_spark.property_graph import PropertyGraph, hypergraph


@pytest.fixture(scope="module")
def karate_graph(spark):
    rows = [(int(s), int(d)) for s, d in karate_edges()]
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=True, renumber=True)
    yield g
    g.unpersist()


def test_k_truss(karate_graph):
    got = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in k_truss(karate_graph, 4).collect()
    }
    want = {
        (min(u, v), max(u, v))
        for u, v in nx.k_truss(nx.karate_club_graph(), 4).edges()
    }
    assert got == want


def test_scc_on_directed_cycle_graph(spark):
    # two 3-cycles joined by a one-way bridge + a tail vertex
    edges = [
        (0, 1), (1, 2), (2, 0),          # SCC A
        (2, 3),                           # bridge A→B
        (3, 4), (4, 5), (5, 3),          # SCC B
        (5, 6),                           # tail (singleton)
    ]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=True, renumber=True)
    got = {}
    for r in strongly_connected_components(g).collect():
        got.setdefault(r.labels, set()).add(r.vertex)
    comps = sorted(sorted(c) for c in got.values())
    assert comps == [[0, 1, 2], [3, 4, 5], [6]]
    g.unpersist()


def test_scc_matches_networkx_on_seeded_digraph(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    edges = {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(160, 2)) if a != b}
    df = spark.createDataFrame(sorted(edges), "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=True, renumber=True)
    got = {}
    for r in strongly_connected_components(g).collect():
        got.setdefault(r.labels, frozenset()),
        got[r.labels] = got.get(r.labels, frozenset()) | {r.vertex}
    nxg = nx.DiGraph(sorted(edges))
    want = {frozenset(c) for c in nx.strongly_connected_components(nxg)}
    assert set(map(frozenset, got.values())) == want
    g.unpersist()


def test_random_walks(spark, karate_graph):
    starts = spark.createDataFrame([(0,), (33,)], "v LONG")
    out = random_walks(karate_graph, starts, max_depth=4).collect()
    walks = {}
    for r in out:
        walks.setdefault(r.walk_id, {})[r.step] = r.vertex
    assert len(walks) == 2
    edges = {(r.src, r.dst) for r in karate_graph.view_edge_list().collect()}
    for path in walks.values():
        assert path[0] in (0, 33)
        for s in range(1, len(path)):
            assert (path[s - 1], path[s]) in edges


def test_biased_random_walks(spark):
    # star with one overwhelmingly heavy edge: a draw ∝ weight must take it
    rows = [(0, 1, 1e6)] + [(0, d, 1e-3) for d in range(2, 6)]
    rows += [(d, 0, 1.0) for d in range(1, 6)]  # no sinks
    df = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = LinkGraph.from_edges(df, directed=True, renumber=True, weight="weight")
    starts = spark.createDataFrame([(0,)] * 1, "v LONG")
    for seed in range(8):
        out = biased_random_walks(g, starts, max_depth=2, seed=seed).collect()
        step1 = [r.vertex for r in out if r.step == 1]
        assert step1 == [1]
    # the facade dispatch reaches the same path
    out = random_walks(
        g, starts, max_depth=2, random_walks_type="biased", seed=3
    ).collect()
    assert [r.vertex for r in out if r.step == 1] == [1]
    g.unpersist()


def test_deterministic_random_walks(spark, karate_graph):
    starts = spark.createDataFrame([(0,), (5,), (33,)], "v LONG")
    runs = [
        sorted(
            (r.walk_id, r.step, r.vertex)
            for r in random_walks(
                karate_graph, starts, max_depth=4, seed=9,
                deterministic=True, rank_modulus=40,
            ).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]  # pure function of (edges, starts, seed)
    edges = {(r.src, r.dst) for r in karate_graph.view_edge_list().collect()}
    walks = {}
    for wid, step, v in runs[0]:
        walks.setdefault(wid, {})[step] = v
    for path in walks.values():
        for s in range(1, len(path)):
            assert (path[s - 1], path[s]) in edges
    other = sorted(
        (r.walk_id, r.step, r.vertex)
        for r in random_walks(
            karate_graph, starts, max_depth=4, seed=10,
            deterministic=True, rank_modulus=40,
        ).collect()
    )
    assert other != runs[0]  # seed actually rotates the permutation


def test_biased_random_walks_requires_weights(spark, karate_graph):
    starts = spark.createDataFrame([(0,)], "v LONG")
    with pytest.raises(ValueError, match="weighted"):
        biased_random_walks(karate_graph, starts, max_depth=2)


def test_node2vec(spark, karate_graph):
    starts = spark.createDataFrame([(0,), (5,)], "v LONG")
    out = node2vec(karate_graph, starts, max_depth=4, p=0.5, q=2.0).collect()
    walks = {}
    for r in out:
        walks.setdefault(r.walk_id, {})[r.step] = r.vertex
    edges = {(r.src, r.dst) for r in karate_graph.view_edge_list().collect()}
    for path in walks.values():
        for s in range(1, len(path)):
            assert (path[s - 1], path[s]) in edges


def test_property_graph_roundtrip(spark):
    pg = PropertyGraph(spark)
    people = spark.createDataFrame(
        [(0, "ann", 34), (1, "bob", 29), (2, "cas", 41)],
        "pid LONG, name STRING, age INT",
    )
    follows = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 1.0), (2, 0, 2.5)],
        "a LONG, b LONG, strength DOUBLE",
    )
    pg.add_vertex_data(people, "pid", type_name="person")
    pg.add_edge_data(follows, ("a", "b"), type_name="follows")

    assert pg.vertex_types == {"person"}
    assert pg.get_num_vertices() == 3
    assert pg.get_num_edges() == 3

    old = pg.select_vertices("age > 30")
    assert {r["_VERTEX_"] for r in old.collect()} == {0, 2}

    strong = pg.select_edges("strength >= 2.0")
    g = pg.extract_subgraph(selection=strong, edge_weight_property="strength")
    pairs = {(r.src, r.dst) for r in g.view_edge_list().collect()}
    assert pairs == {(0, 1), (2, 0)}
    g.unpersist()


def test_hypergraph_builder(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("a", "y")], "u STRING, w STRING"
    )
    hg = hypergraph(df)
    edges = {(r.src, r.dst) for r in hg["edges"].collect()}
    # row ids are the rank under content order (deterministic at any
    # parallelism — VERDICT r01 #2 replaced the insertion-order global
    # window): ("a","x")→0, ("a","y")→1, ("b","x")→2
    assert ("row::2", "u::b") in edges
    assert ("row::2", "w::x") in edges
    # every row node connects to one value node per column
    assert len(edges) == 6
    kinds = {r.kind for r in hg["nodes"].collect()}
    assert kinds == {"row", "value"}


def test_louvain_karate(spark, karate_graph):
    from cugraph_spark.operators import louvain

    parts, q = louvain(karate_graph)
    got = {}
    for r in parts.collect():
        got.setdefault(r.partition, set()).add(r.vertex)
    # all 34 vertices assigned, communities non-trivial
    assert sum(len(c) for c in got.values()) == 34
    assert 2 <= len(got) <= 8
    # modularity agrees with networkx's computation of the same partition
    # weight=None: our fixture graph is unweighted, while networkx's karate
    # carries friendship-strength weights by default
    nxq = nx.algorithms.community.modularity(
        nx.karate_club_graph(), list(got.values()), weight=None
    )
    assert abs(q - nxq) < 1e-6
    # quality: known optimum is ~0.42; local moving should land close
    assert q > 0.38


def test_biased_walks_reject_nonpositive_weights(spark):
    """ADVICE r4: a negative weight flips the exponential-race key sign and
    that edge would always win the argmin — must raise, not mis-sample."""
    rows = [(0, 1, 1.0), (0, 2, -0.5), (1, 0, 1.0), (2, 0, 1.0)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE")
    g = LinkGraph.from_edges(df, directed=True, renumber=True, weight="weight")
    starts = spark.createDataFrame([(0,)], "v LONG")
    with pytest.raises(ValueError, match="strictly positive"):
        biased_random_walks(g, starts, max_depth=2)
    g.unpersist()
    rows0 = [(0, 1, 1.0), (0, 2, 0.0), (1, 0, 1.0), (2, 0, 1.0)]
    df0 = spark.createDataFrame(rows0, "src LONG, dst LONG, weight DOUBLE")
    g0 = LinkGraph.from_edges(df0, directed=True, renumber=True, weight="weight")
    with pytest.raises(ValueError, match="strictly positive"):
        biased_random_walks(g0, starts, max_depth=2)
    g0.unpersist()


def test_random_walks_rejects_incompatible_params(karate_graph, spark):
    """ADVICE r4: deterministic/rank_modulus silently dropped for biased/
    node2vec, and p/q silently dropped outside node2vec — now ValueError."""
    starts = spark.createDataFrame([(0,)], "v LONG")
    with pytest.raises(ValueError, match="deterministic"):
        random_walks(
            karate_graph, starts, 3, random_walks_type="node2vec",
            deterministic=True,
        )
    with pytest.raises(ValueError, match="deterministic"):
        random_walks(
            karate_graph, starts, 3, random_walks_type="biased", rank_modulus=97
        )
    with pytest.raises(ValueError, match="p/q"):
        random_walks(karate_graph, starts, 3, p=0.5)
    with pytest.raises(ValueError, match="p/q"):
        random_walks(karate_graph, starts, 3, random_walks_type="biased", q=2.0)


def test_deterministic_walks_on_edgeless_graph(spark):
    """ADVICE r4: auto modulus sizing hit int(None)+1 on an edgeless graph;
    must now return the starts-only walk set."""
    # a graph whose only rows are self loops that from_edges drops would be
    # empty; use two isolated vertices via a filtered frame instead
    df = spark.createDataFrame([(0, 1)], "src LONG, dst LONG").filter("src > 99")
    g = LinkGraph.from_edges(df, directed=True, renumber=False)
    starts = spark.createDataFrame([(5,), (7,)], "v LONG")
    out = random_walks(g, starts, max_depth=3, deterministic=True).collect()
    assert sorted((r.step, r.vertex) for r in out) == [(0, 5), (0, 7)]
    g.unpersist()
