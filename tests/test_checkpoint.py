"""Checkpoint/resume: kill after iteration k, restart from the manifest,
final ranks identical (SURVEY §5.2 item 5 / north rule resumability)."""

import json
import os

from conftest import karate_edges, seeded_graph

from cugraph_spark.checkpoint import CheckpointManager
from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators.pagerank import pagerank
from cugraph_spark.operators.wcc import weakly_connected_components


def _build(spark, edges, n=4):
    df = spark.createDataFrame([(int(s), int(d)) for s, d in edges], "src LONG, dst LONG")
    return LinkGraph.from_edges(df, directed=True, num_partitions=n)


def test_pagerank_resume_identical(spark, tmp_path):
    edges = karate_edges()
    g = _build(spark, edges)

    # uninterrupted run
    full = pagerank(g, tol=1e-8, max_iter=200)
    ref = {r["vertex"]: r["pagerank"] for r in full.ranks.collect()}

    # interrupted run: stop after 5 iterations (simulated kill)
    ck = CheckpointManager(str(tmp_path), "pr", keep_last=2)
    partial = pagerank(g, tol=1e-8, max_iter=5, checkpointer=ck,
                       fail_on_nonconvergence=False)
    assert not partial.converged
    assert ck.completed_iterations()[-1] == 5

    # resumed run picks up at iteration 5 and finishes
    resumed = pagerank(g, tol=1e-8, max_iter=200, checkpointer=ck)
    assert resumed.converged
    got = {r["vertex"]: r["pagerank"] for r in resumed.ranks.collect()}
    for v in ref:
        assert abs(got[v] - ref[v]) < 1e-12, v
    assert resumed.iterations == full.iterations
    g.unpersist()


def test_manifest_lineage_and_metrics(spark, tmp_path):
    g = _build(spark, seeded_graph(40, 80, seed=2))
    ck = CheckpointManager(str(tmp_path), "wcc")
    weakly_connected_components(g, checkpointer=ck)
    its = ck.completed_iterations()
    assert its, "no checkpoints written"
    m = ck.manifest(its[-1])
    assert m["iteration"] == its[-1]
    assert "changed" in m["metrics"]
    assert m["lineage"]["total_rows"] == 40
    assert all("content_hash" in p for p in m["lineage"]["partitions"])
    assert m["timings"]["write_sec"] >= 0
    g.unpersist()


def test_checkpoint_gc_keeps_last(spark, tmp_path):
    g = _build(spark, karate_edges())
    ck = CheckpointManager(str(tmp_path), "pr", keep_last=3)
    pagerank(g, tol=0, max_iter=8, checkpointer=ck, fail_on_nonconvergence=False)
    assert ck.completed_iterations() == [6, 7, 8]
    g.unpersist()


def test_manifest_is_json_complete(spark, tmp_path):
    g = _build(spark, karate_edges())
    ck = CheckpointManager(str(tmp_path), "pr", keep_last=1)
    pagerank(g, tol=0, max_iter=2, checkpointer=ck, fail_on_nonconvergence=False)
    it = ck.completed_iterations()[-1]
    path = os.path.join(str(tmp_path), "pr", f"iter={it:05d}", "manifest.json")
    with open(path) as f:
        json.load(f)  # valid JSON, atomically replaced
    g.unpersist()
