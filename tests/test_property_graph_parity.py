"""Method-level PropertyGraph parity.

Every public method of the reference ``EXPERIMENTAL__PropertyGraph``
(`structure/property_graph.py`) must resolve on our PropertyGraph, and the
round-4 additions (edges property, property-name lists, get_vertices,
duplicate-edge predicates, type numerals, vector properties,
edge_props_to_graph) must behave like the reference.
"""

from __future__ import annotations

import ast
from pathlib import Path

import numpy as np
import pytest
from pyspark.sql import functions as F

import cugraph_spark as cg
from cugraph_spark.property_graph import (
    DST_COL,
    EDGE_ID_COL,
    SRC_COL,
    PropertyGraph,
)

REF = Path("/root/reference/python/cugraph/cugraph/structure/property_graph.py")


def _ref_methods() -> set[str]:
    tree = ast.parse(REF.read_text())
    out: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and "PropertyGraph" in node.name:
            for n in node.body:
                if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if not n.name.startswith("_"):
                        out.add(n.name)
    return out


def test_every_reference_pg_method_resolves(spark):
    wanted = _ref_methods()
    assert len(wanted) > 20, "failed to parse reference PropertyGraph"
    pg = PropertyGraph(spark)
    missing = sorted(m for m in wanted if not hasattr(pg, m))
    assert missing == [], f"reference PropertyGraph methods missing: {missing}"


@pytest.fixture()
def pg(spark):
    g = PropertyGraph(spark)
    v = spark.createDataFrame(
        [(0, "alice", 30), (1, "bob", 40), (2, "carol", 50)],
        "vid LONG, name STRING, age LONG",
    )
    g.add_vertex_data(v, vertex_col_name="vid", type_name="person")
    e = spark.createDataFrame(
        [(0, 1, 0.5), (1, 2, 0.7), (0, 2, 0.9)],
        "a LONG, b LONG, score DOUBLE",
    )
    g.add_edge_data(e, vertex_col_names=("a", "b"), type_name="knows")
    return g


def test_edges_property_and_names(pg):
    ed = pg.edges
    assert set(ed.columns) == {EDGE_ID_COL, SRC_COL, DST_COL}
    assert ed.count() == 3
    assert pg.vertex_property_names == ["name", "age"]
    assert pg.edge_property_names == ["score"]


def test_get_vertices_union_and_alias(spark, pg):
    # vertex 99 appears only in edge data
    e2 = spark.createDataFrame([(2, 99, 1.0)], "a LONG, b LONG, score DOUBLE")
    pg.add_edge_data(e2, vertex_col_names=("a", "b"), type_name="knows")
    got = [r["vertex"] for r in pg.get_vertices().collect()]
    assert got == [0, 1, 2, 99]  # ascending, union of vertex + edge data
    assert [r["vertex"] for r in pg.vertices_ids().collect()] == got
    with pytest.raises(NotImplementedError):
        pg.get_vertices(selection=object())


def test_duplicate_edge_predicates(spark, pg):
    ed = pg.get_edge_data()
    assert PropertyGraph.has_duplicate_edges(ed) is False
    assert pg.is_multigraph() is False
    dup = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0)], "a LONG, b LONG, score DOUBLE"
    )
    pg.add_edge_data(dup, vertex_col_names=("a", "b"), type_name="knows")
    # parallel (src, dst) but distinct score: multigraph yes, but not a
    # duplicate when score is part of the key
    assert pg.is_multigraph() is True
    ed2 = pg.get_edge_data()
    assert PropertyGraph.has_duplicate_edges(ed2, columns=["score"]) is False
    assert PropertyGraph.has_duplicate_edges(ed2) is True
    assert pg.is_multi_gpu() is False


def test_types_from_numerals(spark, pg):
    v2 = spark.createDataFrame([(7, "acme")], "vid LONG, name STRING")
    pg.add_vertex_data(v2, vertex_col_name="vid", type_name="company")
    # categories are the sorted type names, as in a pandas categorical
    assert pg.vertex_types_from_numerals([0, 1, 0]) == [
        "company", "person", "company",
    ]
    assert pg.edge_types_from_numerals([0]) == ["knows"]


def test_vector_properties_roundtrip(spark):
    g = PropertyGraph(spark)
    v = spark.createDataFrame(
        [(0, 1.0, 2.0), (1, 3.0, 4.0)], "vid LONG, x DOUBLE, y DOUBLE"
    )
    g.add_vertex_data(
        v, vertex_col_name="vid", type_name="pt",
        vector_properties={"pos": ["x", "y"]},
    )
    vd = g.get_vertex_data()
    assert "x" not in vd.columns and "pos" in vd.columns
    arr = g.vertex_vector_property_to_array(vd.orderBy("_VERTEX_"), "pos")
    assert arr.shape == (2, 2)
    assert np.allclose(arr, [[1.0, 2.0], [3.0, 4.0]])


def test_vector_property_missing_handling(spark):
    g = PropertyGraph(spark)
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "vid LONG, pos ARRAY<DOUBLE>"
    )
    g.add_vertex_data(df, vertex_col_name="vid", type_name="pt")
    vd = g.get_vertex_data()
    # ignore drops the missing row
    assert g.vertex_vector_property_to_array(vd, "pos").shape == (1, 2)
    # fillvalue fills it
    arr = g.vertex_vector_property_to_array(vd.orderBy("_VERTEX_"), "pos", fillvalue=0)
    assert np.allclose(arr[1], [0.0, 0.0])
    with pytest.raises(ValueError, match="missing"):
        g.vertex_vector_property_to_array(vd, "pos", missing="error")
    with pytest.raises(TypeError):
        g.vertex_vector_property_to_array(vd, "_VERTEX_")  # scalar column


def test_edge_props_to_graph(spark, pg):
    ed = pg.get_edge_data()
    g = pg.edge_props_to_graph(
        ed, create_using=cg.Graph(directed=True),
        edge_weight_property="score",
    )
    assert g.number_of_edges() == 3
    assert g.is_weighted() and g.is_directed()
    # multi-edge guard: duplicate (src, dst) + non-multigraph target raises
    dup = spark.createDataFrame(
        [(0, 1, 1.0), (0, 1, 2.0)], "a LONG, b LONG, score DOUBLE"
    )
    pg.add_edge_data(dup, vertex_col_names=("a", "b"), type_name="knows")
    with pytest.raises(RuntimeError, match="duplicate edges"):
        pg.edge_props_to_graph(pg.get_edge_data(), create_using=cg.Graph(directed=True))
    # default_edge_weight fills NA scores
    na = spark.createDataFrame([(5, 6, None)], "a LONG, b LONG, score DOUBLE")
    g2 = PropertyGraph(spark)
    g2.add_edge_data(na, vertex_col_names=("a", "b"), type_name="t")
    built = g2.edge_props_to_graph(
        g2.get_edge_data(), create_using=cg.Graph(directed=True),
        edge_weight_property="score", default_edge_weight=9.0,
    )
    assert [r["weight"] for r in built.view_edge_list().collect()] == [9.0]
