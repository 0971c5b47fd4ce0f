"""NetworkX interop + input coercion (utilities.py) vs reference
``utilities/nx_factory.py`` and ``utilities/utils.py:258-395``."""

from __future__ import annotations

import networkx as nx
import numpy as np
import pandas as pd
import pytest

import cugraph_spark as cg
from cugraph_spark import utilities as uti
from cugraph_spark.graph import LinkGraph


@pytest.fixture(scope="module")
def karate_nx():
    return nx.karate_club_graph()


class TestConvertFromNx:
    def test_unweighted_roundtrip(self, spark, karate_nx):
        G = uti.convert_from_nx(karate_nx, spark=spark)
        assert G.number_of_vertices() == karate_nx.number_of_nodes()
        # undirected nx.Graph → symmetrized edge frame
        # our undirected store counts both symmetrized directions
        # (test_graph_methods_parity convention)
        assert G.number_of_edges() == 2 * karate_nx.number_of_edges()
        back = uti.cugraph_to_nx(G)
        assert set(map(frozenset, back.edges())) == set(
            map(frozenset, karate_nx.edges())
        )

    def test_weighted_named(self, spark):
        g = nx.DiGraph()
        g.add_edge(0, 1, cost=2.5)
        g.add_edge(1, 2, cost=0.5)
        G = uti.convert_from_nx(g, weight="cost", spark=spark)
        pdf = G.view_edge_list().toPandas().sort_values(["src", "dst"])
        assert list(pdf.weight) == [2.5, 0.5][: len(pdf)] or set(
            pdf.weight
        ) == {2.5, 0.5}

    def test_weight_none_drops_attrs(self, spark):
        """weight=None means unweighted, exactly like the reference:
        nx.is_weighted(G, weight=None) is False, so attribute data is NOT
        carried (nx_factory.py:129-141)."""
        g = nx.Graph()
        g.add_edge(0, 1, weight=3.0)
        g.add_edge(1, 2, weight=4.0)
        G = uti.convert_from_nx(g, spark=spark)
        # engine convention: unweighted graphs carry implicit weight 1.0
        # (graph.py from_edges), so the attr values must NOT appear
        assert set(G.view_edge_list().toPandas().weight) == {1.0}
        # naming the attribute carries it
        G2 = uti.convert_from_nx(g, weight="weight", spark=spark)
        pdf = G2.view_edge_list().toPandas()
        assert set(pdf.weight) == {3.0, 4.0}

    def test_type_error(self, spark):
        with pytest.raises(TypeError):
            uti.convert_from_nx("not a graph", spark=spark)

    def test_pagerank_accepts_nx_directly(self, spark, karate_nx):
        """The facade coerces nx input exactly like the reference's
        ensure_cugraph_obj_for_nx funnel."""
        df = cg.pagerank(karate_nx, tol=1e-8, max_iter=100)
        scores = uti.df_score_to_dictionary(df, "pagerank")
        assert set(scores) == set(karate_nx.nodes())
        assert abs(sum(scores.values()) - 1.0) < 1e-6
        # identical to converting explicitly first (same coercion funnel)
        df2 = cg.pagerank(
            uti.convert_from_nx(karate_nx, spark=spark), tol=1e-8, max_iter=100
        )
        scores2 = uti.df_score_to_dictionary(df2, "pagerank")
        for v in scores:
            assert abs(scores[v] - scores2[v]) < 1e-12


class TestScoreDictionaries:
    def test_df_score_to_dictionary(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame({"vertex": [2, 0, 1], "score": [0.2, 0.0, 0.1]})
        )
        d = uti.df_score_to_dictionary(df, "score")
        assert d == {0: 0.0, 1: 0.1, 2: 0.2}

    def test_df_edge_score_to_dictionary(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame(
                {"src": [1, 0], "dst": [2, 1], "bc": [0.5, 0.25]}
            )
        )
        d = uti.df_edge_score_to_dictionary(df, "bc")
        assert d == {(0, 1): 0.25, (1, 2): 0.5}


class TestEnsureObj:
    def test_passthrough_and_nx(self, spark, karate_nx):
        edges = spark.createDataFrame(
            pd.DataFrame({"src": [0, 1], "dst": [1, 2]})
        )
        g = LinkGraph.from_edges(edges, directed=True)
        out, was_nx = uti.ensure_cugraph_obj_for_nx(g)
        assert out is g and was_nx is False
        out2, was_nx2 = uti.ensure_cugraph_obj_for_nx(karate_nx)
        assert was_nx2 is True
        assert out2.number_of_vertices() == 34
        with pytest.raises(TypeError):
            uti.ensure_cugraph_obj_for_nx(42)

    def test_ensure_cugraph_obj_types(self, spark, karate_nx):
        obj, t = uti.ensure_cugraph_obj(karate_nx)
        assert t is nx.Graph and obj.number_of_vertices() == 34
        with pytest.raises(TypeError):
            uti.ensure_cugraph_obj([1, 2, 3])

    def test_type_predicates(self):
        assert uti.is_nx_graph_type(nx.DiGraph)
        assert not uti.is_nx_graph_type(dict)
        # neither cupy nor scipy ship in this environment
        assert not uti.is_matrix_type(np.ndarray)
        assert isinstance(uti.cupy_package, uti.MissingModule)
        with pytest.raises(RuntimeError):
            uti.cupy_package.anything

    def test_import_optional(self):
        assert uti.import_optional("math").sqrt(4) == 2.0
        missing = uti.import_optional("definitely_not_a_module")
        with pytest.raises(RuntimeError):
            missing.x


class TestRenumberVertexPair:
    def test_single_column(self, spark):
        edges = spark.createDataFrame(
            pd.DataFrame({"src": [100, 200], "dst": [200, 300]})
        )
        g = LinkGraph.from_edges(edges, directed=True, renumber=True)
        pairs = spark.createDataFrame(
            pd.DataFrame({"first": [100, 200], "second": [200, 300]})
        )
        out = uti.renumber_vertex_pair(g, pairs).toPandas()
        internal = set(range(3))
        assert set(out["first"]) <= internal
        assert set(out["second"]) <= internal
