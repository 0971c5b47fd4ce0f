"""cugraph_spark.datasets — reference Dataset API over generated data."""

from __future__ import annotations

import pytest

import cugraph_spark as cg
from cugraph_spark import datasets


def test_karate_matches_reference_metadata(spark):
    el = datasets.karate.get_edgelist()
    assert el.columns == ["src", "dst", "wgt"]
    assert el.count() == 156  # karate.yaml: number_of_edges
    G = datasets.karate.get_graph()
    assert G.number_of_vertices() == 34
    assert not G.is_directed()
    assert G.is_weighted()
    Gu = datasets.karate.get_graph(ignore_weights=True)
    assert not Gu.is_weighted()


def test_karate_variants(spark):
    assert datasets.karate_asymmetric.get_edgelist().count() == 78
    G = datasets.karate_disjoint.get_graph()
    assert G.number_of_vertices() == 68
    from cugraph_spark.operators.wcc import weakly_connected_components

    assert (
        weakly_connected_components(G).select("labels").distinct().count() == 2
    )
    assert datasets.small_line.get_graph().number_of_vertices() == 10


def test_create_using_variants(spark):
    G = datasets.karate.get_graph(create_using=cg.Graph(directed=True))
    assert G.is_directed()
    G2 = datasets.karate.get_graph(create_using=cg.MultiGraph)
    assert G2.is_multigraph()
    with pytest.raises(TypeError, match="create_using"):
        datasets.karate.get_graph(create_using=42)


def test_unbundled_datasets_fail_honestly(spark):
    with pytest.raises(RuntimeError, match="not bundled"):
        datasets.dolphins.get_edgelist()
    datasets.download_all()  # no-op, must not raise


def test_unload(spark):
    el = datasets.small_line.get_edgelist()
    assert el.count() == 9
    datasets.small_line.unload()
    assert datasets.small_line._edgelist is None
