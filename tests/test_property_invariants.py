"""Property-based invariants (hypothesis) over randomized small graphs.

The reference ships no property-based tests (SURVEY §5); these pin the
engine's structural contracts under arbitrary inputs, not just fixtures:
build symmetry/dedup, dense-id permutation order, renumber roundtrip,
rw_path prefix sums, per-group sampling counts, WCC component structure
vs networkx, MST forest weight vs networkx.

Examples are deliberately few (Spark roundtrips are ~seconds each); the
value is the randomized SHAPE coverage, not the example count.
"""

from __future__ import annotations

import networkx as nx
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cugraph_spark.graph import LinkGraph, assign_dense_ids

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,  # deterministic corpus: CI-stable, still randomized shapes
)

edge_lists = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=1,
    max_size=40,
)


@settings(**SETTINGS)
@given(edges=edge_lists)
def test_undirected_build_is_symmetric_and_deduped(spark, edges):
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=False, renumber=False)
    rows = [(r["src"], r["dst"]) for r in g.edges.collect()]
    s = set(rows)
    assert len(rows) == len(s), "duplicate internal edges"
    assert all((b, a) in s for a, b in s), "missing reverse edge"
    ends = {v for e in rows for v in e} or {v for e in edges for v in e if False}
    if rows:
        assert g.number_of_vertices() == len(ends)


@settings(**SETTINGS)
@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60, unique=True)
)
def test_assign_dense_ids_is_order_preserving_permutation(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k LONG")
    out = assign_dense_ids(df, [F.col("k").asc()], "id").collect()
    got = {r["k"]: r["id"] for r in out}
    assert sorted(got.values()) == list(range(len(keys)))
    ordered = sorted(keys)
    assert all(got[k] == i for i, k in enumerate(ordered))


@settings(**SETTINGS)
@given(edges=edge_lists)
def test_renumber_roundtrip_preserves_edge_multiset(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=True, renumber=True)
    back = {(r["src"], r["dst"]) for r in g.view_edge_list().collect()}
    assert back == set(edges)  # dedup'd directed build == input set


@settings(**SETTINGS)
@given(
    sizes=st.lists(st.integers(1, 9), min_size=1, max_size=20),
)
def test_rw_path_offsets_are_prefix_sums(spark, sizes):
    from cugraph_spark.operators.sampling import rw_path

    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "walk_id LONG, size LONG")
    out = {r["walk_id"]: r for r in rw_path(len(sizes), df).collect()}
    rv = rw = 0
    for i, s in enumerate(sizes):
        assert out[i]["vertex_offsets"] == rv
        assert out[i]["weight_offsets"] == rw
        assert out[i]["weight_sizes"] == s - 1
        rv += s
        rw += s - 1


@settings(**SETTINGS)
@given(
    groups=st.dictionaries(
        st.sampled_from("abcde"), st.integers(1, 12), min_size=1, max_size=5
    ),
    n=st.integers(1, 6),
)
def test_sample_groups_counts(spark, groups, n):
    from cugraph_spark.utilities import sample_groups

    rows = [(g, i) for g, cnt in groups.items() for i in range(cnt)]
    df = spark.createDataFrame(rows, "grp STRING, x LONG")
    out = sample_groups(df, "grp", n, seed=3)
    got = {
        r["grp"]: r["c"]
        for r in out.groupBy("grp").agg(F.count("*").alias("c")).collect()
    }
    assert got == {g: min(n, cnt) for g, cnt in groups.items()}


@settings(**SETTINGS)
@given(edges=edge_lists)
def test_wcc_component_structure_matches_networkx(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    from cugraph_spark.operators.wcc import weakly_connected_components

    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    g = LinkGraph.from_edges(df, directed=False, renumber=False)
    labels = weakly_connected_components(g).collect()
    by_label: dict = {}
    for r in labels:
        by_label.setdefault(r["labels"], set()).add(r["vertex"])
    nxg = nx.Graph(edges)
    nx_comps = {frozenset(c) for c in nx.connected_components(nxg)}
    assert {frozenset(c) for c in by_label.values()} == nx_comps


@settings(**SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=2,
        max_size=30,
    )
)
def test_mst_weight_matches_networkx(spark, edges):
    from cugraph_spark.operators.mst import minimum_spanning_tree

    rows = sorted(
        {(a, b, float((a * 13 + b * 7) % 19) + 1.0) for a, b in edges if a < b}
    )
    if not rows:
        return
    df = spark.createDataFrame(rows, "src LONG, dst LONG, w DOUBLE")
    g = LinkGraph.from_edges(df, weight="w", directed=False, renumber=False)
    got = sum(r["weight"] for r in minimum_spanning_tree(g).collect())
    nxg = nx.Graph()
    nxg.add_weighted_edges_from(rows)
    exact = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_tree(nxg).edges(data=True)
    )
    assert got == pytest.approx(exact, abs=1e-9)
