"""Method-level Graph parity.

`tests/test_api_parity.py` covers the module-level export surface; this file
covers the METHOD surface of the reference `Graph` class: every public method
of `cugraph.Graph` (`structure/graph_classes.py`) and its SG implementation
(`graph_implementation/simpleGraph.py`) must resolve on our `Graph` shim /
`LinkGraph`, and the substantive ones must behave like the reference.
"""

from __future__ import annotations

import ast
from pathlib import Path

import pytest
from pyspark.sql import functions as F

import cugraph_spark as cg
from cugraph_spark.graph import LinkGraph

REF = Path("/root/reference/python/cugraph/cugraph/structure")


def _public_methods(path: Path, class_names: set[str]) -> set[str]:
    tree = ast.parse(path.read_text())
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name in class_names:
            for n in node.body:
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if not n.name.startswith("_"):
                        out.add(n.name)
    return out


def test_every_reference_graph_method_resolves(spark, karate_df):
    wanted = _public_methods(REF / "graph_classes.py", {"Graph"})
    wanted |= _public_methods(
        REF / "graph_implementation" / "simpleGraph.py", {"simpleGraphImpl"}
    )
    assert len(wanted) > 40, "failed to parse reference classes"
    G = cg.Graph()
    G.from_cudf_edgelist(karate_df, source="src", destination="dst")
    missing = sorted(
        m for m in wanted if not (hasattr(G, m) or hasattr(type(G), m))
    )
    assert missing == [], f"reference Graph methods missing: {missing}"


def test_typed_class_methods_resolve(spark):
    from cugraph_spark.graph_classes import BiPartiteGraph, NPartiteGraph, Tree

    ours = {
        "MultiGraph": cg.MultiGraph,
        "Tree": Tree,
        "NPartiteGraph": NPartiteGraph,
        "BiPartiteGraph": BiPartiteGraph,
    }
    tree = ast.parse((REF / "graph_classes.py").read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name in ours:
            for n in node.body:
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if not n.name.startswith("_"):
                        assert hasattr(ours[node.name], n.name), (
                            f"{node.name}.{n.name} missing"
                        )


def test_prebuild_predicates_and_multigraph_density(spark):
    assert cg.Graph(directed=True).is_directed() is True
    assert cg.Graph().is_multigraph() is False
    M = cg.MultiGraph()
    assert M.is_multigraph() is True  # no edge list needed (reference)
    with pytest.raises(TypeError, match="not support on a Multigraph"):
        M.density()


def test_npartite_from_cudf_edgelist(spark):
    from cugraph_spark.graph_classes import BiPartiteGraph

    df = spark.createDataFrame(
        [(0, 10), (1, 10), (1, 11)], "source LONG, destination LONG"
    )
    g = BiPartiteGraph.from_cudf_edgelist(df)
    assert g.is_bipartite() and not g.is_directed()
    # dask spelling works too (reference raises; Spark frames are
    # already distributed)
    g2 = BiPartiteGraph.from_dask_cudf_edgelist(df)
    assert g2.number_of_edges() == g.number_of_edges()


# ------------------------------------------------------------------ degrees
def test_degree_triple(spark, karate_df):
    G = cg.Graph()
    G.from_cudf_edgelist(karate_df, source="src", destination="dst")
    deg = {r["vertex"]: r["degree"] for r in G.degree().collect()}
    ind = {r["vertex"]: r["degree"] for r in G.in_degree().collect()}
    outd = {r["vertex"]: r["degree"] for r in G.out_degree().collect()}
    import networkx as nx

    nxg = nx.karate_club_graph()
    # undirected store keeps both directions: in == out == nx degree
    for v in nxg.nodes:
        assert ind[v] == outd[v] == nxg.degree[v]
        assert deg[v] == 2 * nxg.degree[v]  # reference degree() = in + out


def test_degree_vertex_subset(spark, karate_df):
    G = cg.Graph()
    G.from_cudf_edgelist(karate_df, source="src", destination="dst")
    rows = G.in_degree(vertex_subset=[0, 9, 12]).collect()
    assert {r["vertex"] for r in rows} == {0, 9, 12}


# ----------------------------------------------------------- id translation
def test_lookup_and_add_internal_vertex_id(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")],
        "source STRING, destination STRING",
    )
    G = cg.Graph(directed=True)
    G.from_cudf_edgelist(df)
    ids = [r["id"] for r in G.lookup_internal_vertex_id(["a", "b", "c"]).collect()]
    assert sorted(ids) == [0, 1, 2]  # dense contiguous internal ids

    props = spark.createDataFrame([("a", 10.0), ("c", 30.0)], "v STRING, x DOUBLE")
    out = G.add_internal_vertex_id(props, "vid", "v", drop=False)
    rows = {r["v"]: r["vid"] for r in out.collect()}
    full = {r["ext_id"]: r["id"] for r in G.renumber_map.collect()}
    assert rows == {"a": full["a"], "c": full["c"]}
    # drop=True removes the external column
    assert "v" not in G.add_internal_vertex_id(props, "vid", "v").columns


def test_add_internal_vertex_id_preserve_order(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "source LONG, destination LONG"
    )
    G = cg.Graph(directed=True)
    G.from_cudf_edgelist(df)
    probe = spark.createDataFrame([(v,) for v in range(50, -1, -1)], ["v"])
    out = G.add_internal_vertex_id(probe, "vid", "v", drop=False, preserve_order=True)
    got = [r["v"] for r in out.collect()]
    assert got == list(range(50, -1, -1))


# ------------------------------------------------------------ predicates etc
def test_predicates_and_misc(spark, karate_df):
    G = cg.Graph()
    G.from_cudf_edgelist(karate_df, source="src", destination="dst")
    assert G.is_renumbered() is True
    assert G.is_weighted() is False
    assert G.is_remote() is False
    assert G.is_multi_gpu() is True  # Spark frames are always distributed
    assert G.has_self_loop() is False
    assert G.has_isolated_vertices() is False
    assert G.number_of_nodes() == G.number_of_vertices() == 34
    assert G.vertex_column_size() == 1
    G.enable_batch()  # no-op, must not raise
    G.delete_adj_list()  # no-op, must not raise


def test_self_loop_and_isolated(spark):
    df = spark.createDataFrame(
        [(0, 0), (0, 1)], "source LONG, destination LONG"
    )
    G = cg.Graph(directed=True)
    G.from_cudf_edgelist(df)
    assert G.has_self_loop() is True
    G.add_nodes_from([0, 1, 99])
    assert G.has_isolated_vertices() is True


def test_vertex_column_size_multi_key(spark):
    df = spark.createDataFrame(
        [("a", 1, "b", 2), ("b", 2, "c", 3)],
        "s1 STRING, s2 LONG, d1 STRING, d2 LONG",
    )
    g = LinkGraph.from_edges(df, src=["s1", "s2"], dst=["d1", "d2"], directed=True)
    assert g.vertex_column_size() == 2


def test_two_hop_and_random_vertices_methods(spark, karate_df):
    G = cg.Graph()
    G.from_cudf_edgelist(karate_df, source="src", destination="dst")
    all_pairs = G.get_two_hop_neighbors()
    sub = G.get_two_hop_neighbors(start_vertices=[0])
    assert 0 < sub.count() < all_pairs.count()
    assert {r["first"] for r in sub.collect()} == {0}
    rv = G.select_random_vertices(random_state=7, num_vertices=5)
    assert rv.count() == 5


def test_delete_edge_list_keeps_graph_usable(spark, karate_df):
    G = cg.Graph()
    G.from_cudf_edgelist(karate_df, source="src", destination="dst")
    n = G.number_of_edges()
    G.delete_edge_list()  # frees the cache; lineage recomputes
    assert G.edges.count() == n


def test_clear(spark, karate_df):
    G = cg.Graph()
    G.from_cudf_edgelist(karate_df, source="src", destination="dst")
    G.clear()
    assert G.edges is None and G.renumber_map is None


# ------------------------------------------------------------- constructors
def test_shim_adjlist_and_matrix_constructors(spark):
    import numpy as np

    # path graph 0-1-2 as CSR (undirected: both directions stored)
    offsets, indices = [0, 1, 3, 4], [1, 0, 2, 1]
    G = cg.Graph()
    G.from_cudf_adjlist(offsets, indices)
    assert G.number_of_vertices() == 3
    assert G.number_of_edges() == 4  # symmetric store

    a = np.array([[0, 2.0], [0, 0]])
    G2 = cg.Graph(directed=True)
    G2.from_numpy_array(a)
    assert G2.number_of_edges() == 1
    pda = G2.to_pandas_adjacency()
    assert pda.loc[0, 1] == 2.0

    G3 = cg.Graph(directed=True)
    G3.from_numpy_matrix(a)
    assert (G3.to_numpy_matrix() == G2.to_numpy_array()).all()


def test_shim_from_pandas_adjacency(spark):
    import pandas as pd

    pdf = pd.DataFrame(
        [[0, 1.0], [1.0, 0]], index=["x", "y"], columns=["x", "y"]
    )
    G = cg.Graph()
    G.from_pandas_adjacency(pdf)
    assert G.number_of_vertices() == 2
    pda = G.to_pandas_adjacency()
    assert set(pda.index) == {"x", "y"}
    assert pda.loc["x", "y"] == 1.0
