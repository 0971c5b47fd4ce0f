"""Typed graph classes — Tree / NPartiteGraph / BiPartiteGraph parity.

Reference: ``structure/graph_classes.py:824-1023`` and
``graph_implementation/npartiteGraph.py:40-101`` (partition-set
bookkeeping, flag semantics, error contract), plus ``add_nodes_from`` /
``nodes()`` on the base Graph (graph_classes.py:748-757).
"""

import pytest

from cugraph_spark import BiPartiteGraph, LinkGraph, NPartiteGraph, Tree


def _path_graph(spark, n=6, cls=LinkGraph, **kw):
    rows = [(i, i + 1) for i in range(n - 1)]
    return cls.from_edges(
        spark.createDataFrame(rows, "src long, dst long"), directed=False, **kw
    )


def test_tree_flags_and_validation(spark):
    t = _path_graph(spark, 6, Tree)
    assert t.is_tree() and not LinkGraph.from_edges(
        spark.createDataFrame([(0, 1)], "src long, dst long")
    ).properties.tree
    assert t.is_tree(validate=True)
    # add a cycle edge: |E| != |V|-1 → structural check fails, flag stays
    cyc = Tree.from_edges(
        spark.createDataFrame(
            [(i, i + 1) for i in range(5)] + [(5, 0)], "src long, dst long"
        ),
        directed=False,
    )
    assert cyc.is_tree() and not cyc.is_tree(validate=True)
    # disconnected forest: V=7, E=5 → |E| ≠ |V|−1, not a tree
    forest = Tree.from_edges(
        spark.createDataFrame(
            [(0, 1), (1, 2), (3, 4), (3, 5), (6, 3)], "src long, dst long"
        ),
        directed=False,
    )
    assert forest.number_of_vertices() == 7
    assert not forest.is_tree(validate=True)


def test_bipartite_sets_explicit_and_complement(spark):
    rows = [(0, 100), (1, 101), (2, 100), (0, 102)]
    g = BiPartiteGraph.from_edges(
        spark.createDataFrame(rows, "src long, dst long"), directed=False
    )
    assert g.is_bipartite() and g.is_multipartite()
    g.add_nodes_from([0, 1, 2], bipartite="workers")
    top, bottom = g.sets()
    assert sorted(r.vertex for r in top.collect()) == [0, 1, 2]
    # complement path: bottom = all nodes − top (left-anti, distributed)
    assert sorted(r.vertex for r in bottom.collect()) == [100, 101, 102]
    # explicit second partition overrides the complement
    g.add_nodes_from([100, 101, 102, 103], bipartite="jobs")
    top2, bottom2 = g.sets()
    assert sorted(r.vertex for r in bottom2.collect()) == [100, 101, 102, 103]


def test_bipartite_complement_includes_isolated_nodes(spark):
    g = BiPartiteGraph.from_edges(
        spark.createDataFrame([(0, 100)], "src long, dst long"), directed=False
    )
    # base-class add_nodes_from (no partition kwarg is an error on the
    # npartite classes, so register the full node set via LinkGraph's)
    LinkGraph.add_nodes_from(g, [0, 100, 999])
    g.add_nodes_from([0], bipartite="top")
    _, bottom = g.sets()
    assert sorted(r.vertex for r in bottom.collect()) == [100, 999]
    assert sorted(r.vertex for r in g.nodes().collect()) == [0, 100, 999]


def test_npartite_partitions_and_errors(spark):
    g = NPartiteGraph.from_edges(
        spark.createDataFrame([(0, 10), (10, 20), (0, 20)], "src long, dst long"),
        directed=False,
    )
    assert g.is_multipartite() and not g.is_bipartite()
    with pytest.raises(Exception, match="Partition not provided"):
        g.add_nodes_from([0])
    with pytest.raises(Exception, match="npartite"):
        g.add_nodes_from([0], bipartite="a")
    g.add_nodes_from([0], multipartite="a")
    g.add_nodes_from([10], multipartite="b")
    g.add_nodes_from([20], multipartite="c")
    s = g.sets()
    assert sorted(s) == ["a", "b", "c"]
    assert [r.vertex for r in s["b"].collect()] == [10]


def test_bipartite_rejects_multipartite_kwarg_and_third_set(spark):
    g = BiPartiteGraph.from_edges(
        spark.createDataFrame([(0, 1)], "src long, dst long"), directed=False
    )
    with pytest.raises(Exception, match="bipartite"):
        g.add_nodes_from([0], multipartite="x")
    g.add_nodes_from([0], bipartite="a")
    g.add_nodes_from([1], bipartite="b")
    with pytest.raises(Exception, match="two partitions"):
        g.add_nodes_from([2], bipartite="c")
    # re-registering an existing partition name is allowed (reference
    # overwrites the stored series)
    g.add_nodes_from([0, 2], bipartite="a")
    top, _ = g.sets()
    assert sorted(r.vertex for r in top.collect()) == [0, 2]


def test_algorithms_run_on_typed_classes(spark):
    from cugraph_spark.operators import pagerank

    g = _path_graph(spark, 8, BiPartiteGraph)
    ranks = pagerank(g, max_iter=100, tol=1e-6).ranks
    assert ranks.count() == 8
