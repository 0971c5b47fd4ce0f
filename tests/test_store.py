"""Bucketed graph persistence (store.py): save/load roundtrip fidelity and
the no-build-shuffle guarantee of the bucketed edge table."""

from __future__ import annotations

import uuid

import pandas as pd
import pytest

from cugraph_spark import store
from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import pagerank


@pytest.fixture()
def saved(spark, karate_graph):
    name = f"g_{uuid.uuid4().hex[:10]}"
    store.save_graph(karate_graph, name)
    yield name, karate_graph
    store.drop_graph(spark, name)


@pytest.fixture(scope="module")
def karate_graph(spark):
    from tests.conftest import karate_edges

    pdf = pd.DataFrame(karate_edges(), columns=["src", "dst"])
    # shift ids so the renumber map is non-trivial
    pdf = pdf + 1000
    g = LinkGraph.from_edges(
        spark.createDataFrame(pdf), directed=True, renumber=True
    )
    yield g


def test_roundtrip_identical_results(spark, saved):
    name, g = saved
    g2 = store.load_graph(spark, name)
    assert g2.num_partitions == g.num_partitions
    assert g2.properties == g.properties
    assert g2.number_of_vertices() == g.number_of_vertices()
    assert g2.number_of_edges() == g.number_of_edges()
    a = pagerank(g, tol=1e-8, max_iter=100).ranks.toPandas()
    b = pagerank(g2, tol=1e-8, max_iter=100).ranks.toPandas()
    a = a.sort_values("vertex").reset_index(drop=True)
    b = b.sort_values("vertex").reset_index(drop=True)
    assert list(a.vertex) == list(b.vertex)
    assert max(abs(a.pagerank - b.pagerank)) < 1e-15


def test_bucketed_scan_avoids_exchange(spark, saved):
    name, _ = saved
    plan = (
        spark.table(f"{name}_edges")
        .groupBy("src")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_overwrite_and_error_modes(spark, saved):
    name, g = saved
    with pytest.raises(Exception):
        store.save_graph(g, name)  # default errorifexists
    store.save_graph(g, name, mode="overwrite")
    g2 = store.load_graph(spark, name)
    assert g2.number_of_edges() == g.number_of_edges()


def test_unrenumbered_graph(spark):
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 0]})
    )
    g = LinkGraph.from_edges(edges, directed=True, renumber=False)
    name = f"g_{uuid.uuid4().hex[:10]}"
    try:
        store.save_graph(g, name)
        g2 = store.load_graph(spark, name)
        assert g2.renumber_map is None
        assert g2.number_of_edges() == 3
    finally:
        store.drop_graph(spark, name)
