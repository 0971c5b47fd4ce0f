"""Top-level API-parity tests.

Every name the reference exports at ``cugraph.*``
(``python/cugraph/cugraph/__init__.py:14-121``) must resolve at
``cugraph_spark.*`` with the same spelling, and the api.py facade adapters
(Graph shim, symmetrize, connected_components, nx-compat wrappers,
maximum_spanning_tree, rw_path, bfs_edges) must behave like the reference.
"""

from __future__ import annotations

import re
from pathlib import Path

import networkx as nx
import pytest
from pyspark.sql import functions as F

from conftest import karate_edges, seeded_graph, two_component_graph

import cugraph_spark as cg

REF_INIT = Path("/root/reference/python/cugraph/cugraph/__init__.py")

# Module-object exports the reference re-exports as namespaces; out of scope
# per SURVEY §2.6 (`utils` grab-bag, `experimental`/`gnn` packages — their
# user-facing callables `strong_connected_component` / `find_bicliques` ARE
# exported here directly). `exceptions` is provided.
MODULE_EXPORTS_OUT_OF_SCOPE = {"utils", "experimental", "gnn"}


def _reference_names() -> set[str]:
    txt = REF_INIT.read_text()
    names: set[str] = set()
    # parenthesized import blocks
    for m in re.finditer(r"from\s+cugraph[\w.]*\s+import\s+\(([^)]*)\)", txt):
        names.update(t.strip() for t in m.group(1).split(",") if t.strip())
    # single-line imports
    for m in re.finditer(
        r"^from\s+cugraph[\w.]*\s+import\s+([\w, ]+)\s*$", txt, re.M
    ):
        names.update(t.strip() for t in m.group(1).split(",") if t.strip())
    return names


def test_every_reference_export_resolves():
    wanted = _reference_names() - MODULE_EXPORTS_OUT_OF_SCOPE
    assert wanted, "failed to parse reference __init__.py"
    missing = sorted(n for n in wanted if not hasattr(cg, n))
    assert missing == [], f"reference exports missing from cugraph_spark: {missing}"


def test_reference_exports_list_is_honest():
    # REFERENCE_EXPORTS must be a subset of what the reference really exports
    # (no invented names) and every entry must resolve.
    ref = _reference_names()
    bogus = sorted(n for n in cg.REFERENCE_EXPORTS if n not in ref)
    assert bogus == [], f"REFERENCE_EXPORTS entries not in the reference: {bogus}"
    assert all(hasattr(cg, n) for n in cg.REFERENCE_EXPORTS)


def test_exceptions_module_parity():
    assert issubclass(cg.exceptions.FailedToConvergeError, RuntimeError)
    assert cg.FailedToConvergeError is cg.exceptions.FailedToConvergeError


# ------------------------------------------------------------------ Graph shim
def test_graph_shim_two_step_build_and_algorithms(spark, karate_df):
    G = cg.Graph(directed=False)
    G.from_cudf_edgelist(karate_df, source="src", destination="dst")
    assert G.number_of_vertices() == 34
    assert not cg.is_directed(G)
    assert not cg.is_multigraph(G)
    assert not cg.is_weighted(G)
    # algorithms accept the shim transparently (attribute delegation)
    pr = cg.pagerank(G).collect()
    assert len(pr) == 34
    assert sum(r["pagerank"] for r in pr) == pytest.approx(1.0, abs=1e-6)


def test_graph_shim_requires_edgelist():
    G = cg.Graph()
    with pytest.raises(RuntimeError, match="no edge list"):
        G.number_of_vertices()
    with pytest.raises(RuntimeError, match="no edge list"):
        cg.is_directed(G)


def test_multigraph_shim_preserves_parallel_edges(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 2)], "source LONG, destination LONG"
    )
    G = cg.MultiGraph(directed=True)
    G.from_cudf_edgelist(df)
    assert cg.is_multigraph(G)
    assert G.number_of_edges() == 3


def test_from_edgelist_create_using(spark):
    pdf_rows = [(0, 1, 2.0), (1, 2, 3.0)]
    df = spark.createDataFrame(pdf_rows, "source LONG, destination LONG, w DOUBLE")
    g_dir = cg.from_edgelist(df, edge_attr="w", create_using=cg.Graph(directed=True))
    assert g_dir.is_directed() and cg.is_weighted(g_dir)
    g_und = cg.from_cudf_edgelist(df)
    assert not g_und.is_directed()


# ------------------------------------------------------------------ symmetrize
def test_symmetrize_min_dedups_and_keeps_names(spark):
    df = spark.createDataFrame(
        [(0, 1, 5.0), (1, 0, 2.0), (1, 2, 7.0)], "a LONG, b LONG, v DOUBLE"
    )
    out = cg.symmetrize(df, "a", "b", "v")
    assert set(out.columns) == {"a", "b", "v"}
    rows = {(r["a"], r["b"]): r["v"] for r in out.collect()}
    # reverse-union then min-dedup: (0,1) appears both ways with min(5,2)=2
    assert rows[(0, 1)] == 2.0 and rows[(1, 0)] == 2.0
    assert rows[(1, 2)] == 7.0 and rows[(2, 1)] == 7.0


def test_symmetrize_df_multi_keeps_duplicates(spark):
    df = spark.createDataFrame([(0, 1, 1.0), (0, 1, 2.0)], "src LONG, dst LONG, w DOUBLE")
    both = cg.symmetrize_df(df, "src", "dst", multi=True)
    assert both.count() == 4  # 2 forward + 2 reverse, no dedup
    ddf = cg.symmetrize_ddf(df, "src", "dst")
    assert ddf.count() == 2  # min-dedup'd each direction


# ------------------------------------------------------------------ components
def test_connected_components_dispatch(spark):
    rows = [(int(a), int(b)) for a, b in two_component_graph()]
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    g = cg.from_cudf_edgelist(df, source="src", destination="dst")
    wcc = cg.connected_components(g, connection="weak")
    n_comp = wcc.select("labels").distinct().count()
    assert n_comp == 2
    scc = cg.connected_components(g, connection="strong")
    assert scc.select("labels").distinct().count() == 2
    with pytest.raises(ValueError):
        cg.connected_components(g, connection="bogus")


# ------------------------------------------------- nx-compat link prediction
def test_jaccard_coefficient_ebunch(spark, karate_df):
    g = cg.from_cudf_edgelist(karate_df, source="src", destination="dst")
    pairs = [(0, 1), (0, 33)]
    out = cg.jaccard_coefficient(g, ebunch=pairs).collect()
    assert {(r["first"], r["second"]) for r in out} == set(pairs)
    nxg = nx.karate_club_graph()
    exact = {(u, v): p for u, v, p in nx.jaccard_coefficient(nxg, pairs)}
    for r in out:
        assert r["jaccard_coeff"] == pytest.approx(
            exact[(r["first"], r["second"])], abs=1e-9
        )


# ------------------------------------------------------------------ traversal
def test_bfs_edges_matches_bfs_and_raises(spark, karate_df):
    g = cg.from_cudf_edgelist(karate_df, source="src", destination="dst")
    a = {r["vertex"]: r["distance"] for r in cg.bfs_edges(g, 0).collect()}
    b = {r["vertex"]: r["distance"] for r in cg.bfs(g, 0).collect()}
    assert a == b
    with pytest.raises(NotImplementedError):
        cg.bfs_edges(g, 0, reverse=True)
    with pytest.raises(NotImplementedError):
        cg.bfs_edges(g, 0, sort_neighbors=lambda x: x)
    with pytest.raises(NotImplementedError):
        cg.concurrent_bfs([g], [0])
    with pytest.raises(NotImplementedError):
        cg.multi_source_bfs(g, [0])


def test_shortest_path_alias():
    assert cg.shortest_path is cg.sssp
    assert cg.strong_connected_component is cg.strongly_connected_components


# ------------------------------------------------------------------ max-MST
def test_maximum_spanning_tree_matches_networkx(spark):
    rng_edges = seeded_graph(40, 90, seed=17)
    # deterministic distinct-ish weights keyed on the endpoint pair
    rows = [
        (a, b, float((a * 131 + b * 17) % 97) + 1.0)
        for a, b in rng_edges
        if a < b
    ]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, w DOUBLE")
    g = cg.from_cudf_edgelist(df, source="src", destination="dst", edge_attr="w")
    out = cg.maximum_spanning_tree(g).collect()

    nxg = nx.Graph()
    nxg.add_weighted_edges_from(rows)
    exact = nx.maximum_spanning_tree(nxg)
    assert len(out) == exact.number_of_edges()
    got_w = sum(r["weight"] for r in out)
    exact_w = sum(d["weight"] for _, _, d in exact.edges(data=True))
    assert got_w == pytest.approx(exact_w, abs=1e-9)
    # returned weights are the ORIGINAL (positive) ones, not negated
    assert all(r["weight"] > 0 for r in out)


def test_min_vs_max_spanning_tree_differ(spark):
    rows = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, w DOUBLE")
    g = cg.from_cudf_edgelist(df, source="src", destination="dst", edge_attr="w")
    wmin = sum(r["weight"] for r in cg.minimum_spanning_tree(g).collect())
    wmax = sum(r["weight"] for r in cg.maximum_spanning_tree(g).collect())
    assert wmin == pytest.approx(3.0)  # 1 + 2
    assert wmax == pytest.approx(5.0)  # 2 + 3


# ------------------------------------------------------------------ rw_path
def test_rw_path_offsets(spark, karate_df):
    g = cg.from_cudf_edgelist(karate_df, source="src", destination="dst")
    starts = spark.createDataFrame([(v,) for v in range(8)], "v LONG")
    walks = cg.random_walks(g, starts, max_depth=5, seed=3)
    sizes = (
        walks.groupBy("walk_id")
        .agg(F.count("*").alias("size"))
        .orderBy("walk_id")
        .collect()
    )
    out = {r["walk_id"]: r for r in cg.rw_path(8, walks).collect()}
    assert len(out) == 8
    run_v = run_w = 0
    for r in sizes:
        o = out[r["walk_id"]]
        assert o["vertex_offsets"] == run_v
        assert o["weight_sizes"] == r["size"] - 1
        assert o["weight_offsets"] == run_w
        run_v += r["size"]
        run_w += r["size"] - 1


def test_rw_path_accepts_sizes_frame(spark):
    sizes = spark.createDataFrame(
        [(0, 3), (1, 5), (2, 2), (3, 4)], "walk_id LONG, size LONG"
    )
    out = {r["walk_id"]: r for r in cg.rw_path(3, sizes).collect()}
    assert set(out) == {0, 1, 2}  # num_paths bounds the output
    assert out[0]["vertex_offsets"] == 0
    assert out[1]["vertex_offsets"] == 3
    assert out[2]["vertex_offsets"] == 8
    assert out[2]["weight_offsets"] == 2 + 4


# ------------------------------------------------------------- nonconvergence
def test_scc_raises_failed_to_converge(spark):
    # a 3-cycle cannot finish in max_outer=0 rounds
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src LONG, dst LONG")
    g = cg.from_cudf_edgelist(
        df, source="src", destination="dst", create_using=cg.Graph(directed=True)
    )
    with pytest.raises(cg.FailedToConvergeError):
        cg.strongly_connected_components(g, max_outer=0, fail_on_nonconvergence=True)
