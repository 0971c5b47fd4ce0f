"""get_traversed_cost (pointer-doubling path sums) and sample_groups."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from conftest import karate_edges

import cugraph_spark as cg
from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators.traversal import bfs, sssp
from cugraph_spark.utilities import get_traversed_cost, sample_groups


def _weighted_karate(spark):
    rows = [
        (a, b, float((a * 7 + b * 3) % 11) + 1.0) for a, b in karate_edges()
    ]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, w DOUBLE")
    g = LinkGraph.from_edges(
        df, weight="w", directed=False, renumber=False
    )
    return g, rows


def test_traversed_cost_matches_tree_walk(spark):
    g, rows = _weighted_karate(spark)
    res = bfs(g, 0)
    edge_df = g.edges.select("src", "dst", "weight")
    out = {
        r["vertex"]: r["info"]
        for r in get_traversed_cost(res, 0, edge_df).collect()
    }
    # host-side oracle: walk each predecessor chain, summing the
    # min-symmetrized weights (exactly the reference semantics)
    wmap = {}
    for a, b, w in rows:
        wmap[(a, b)] = min(w, wmap.get((a, b), w))
        wmap[(b, a)] = min(w, wmap.get((b, a), w))
    pred = {r["vertex"]: r["predecessor"] for r in res.collect()}
    for v, p in pred.items():
        cost, cur = 0.0, v
        while pred[cur] != -1:
            cost += wmap[(pred[cur], cur)]
            cur = pred[cur]
        assert out[v] == pytest.approx(cost, abs=1e-9), f"vertex {v}"
    assert out[0] == 0.0


def test_traversed_cost_sssp_equals_distance(spark):
    # along an SSSP tree the path sum IS the distance — a free invariant
    g, _ = _weighted_karate(spark)
    res = sssp(g, 0)
    edge_df = g.edges.select("src", "dst", "weight")
    got = {
        r["vertex"]: r["info"]
        for r in get_traversed_cost(res, 0, edge_df).collect()
    }
    for r in res.collect():
        assert got[r["vertex"]] == pytest.approx(r["distance"], abs=1e-9)


def test_traversed_cost_validates_input(spark):
    df = spark.createDataFrame([(0, 1)], "vertex LONG, distance INT")
    with pytest.raises(ValueError, match="predecessor"):
        get_traversed_cost(df, 0, df)


def test_traversed_cost_deep_chain(spark):
    # a 200-deep path exercises the doubling loop well past one round
    n = 200
    rows = [(i, i + 1, 1.0) for i in range(n)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, w DOUBLE")
    g = LinkGraph.from_edges(df, weight="w", directed=True, renumber=False)
    res = bfs(g, 0)
    out = {
        r["vertex"]: r["info"]
        for r in get_traversed_cost(res, 0, g.edges.select("src", "dst", "weight")).collect()
    }
    assert out[n] == pytest.approx(float(n))
    assert out[1] == pytest.approx(1.0)


def test_sample_groups(spark):
    df = spark.createDataFrame(
        [(g, i) for g in ("a", "b", "c") for i in range(10)], "grp STRING, x LONG"
    )
    out = sample_groups(df, "grp", 3, seed=7)
    counts = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 3, "b": 3, "c": 3}
    # sampled rows come from the original frame
    assert out.join(df, ["grp", "x"], "left_anti").count() == 0
    # n_samples=-1 keeps everything
    assert sample_groups(df, "grp", -1).count() == 30
