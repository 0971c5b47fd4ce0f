"""GNN training-data surface (gnn.py) vs reference ``cugraph/gnn``:
FeatureStore (feat_storage.py:26-96), batched uniform neighbor sampling
(bulk_sampler.py:262-273), BulkSampler parquet layout + batch renumbering
(bulk_sampler.py:34-299, bulk_sampler_io.py:86-99)."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pytest

from cugraph_spark import gnn
from cugraph_spark.graph import LinkGraph


@pytest.fixture(scope="module")
def small_graph(spark):
    edges = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": [0, 0, 0, 1, 1, 2, 2, 3, 4, 5, 5, 6],
                "dst": [1, 2, 3, 2, 4, 3, 5, 6, 5, 6, 0, 1],
            }
        )
    )
    g = LinkGraph.from_edges(edges, directed=True, renumber=False)
    yield g


def _seed_df(spark):
    return spark.createDataFrame(
        pd.DataFrame({"start": [0, 1, 5], "batch": [0, 0, 1]})
    )


class TestBatchedSampling:
    def test_fanout_cap_and_edge_subset(self, spark, small_graph):
        out = gnn.uniform_neighbor_sample_batched(
            small_graph, _seed_df(spark), [2, 1], seed=7
        ).toPandas()
        # per (batch, source, hop) at most fanout rows
        per = out.groupby(["batch_id", "sources", "hop_id"]).size()
        for (_, _, hop), n in per.items():
            assert n <= [2, 1][hop]
        # every sampled pair is a real edge
        real = {
            (r["src"], r["dst"])
            for r in small_graph.edges.select("src", "dst").collect()
        }
        assert set(zip(out.sources, out.destinations)) <= real

    def test_deterministic_across_partitioning(self, spark, small_graph):
        edges = small_graph.edges.select("src", "dst")
        g2 = LinkGraph.from_edges(
            edges.repartition(5), directed=True, renumber=False
        )
        a = sorted(
            map(
                tuple,
                gnn.uniform_neighbor_sample_batched(
                    small_graph, _seed_df(spark), [2, 1], seed=7
                ).collect(),
            )
        )
        b = sorted(
            map(
                tuple,
                gnn.uniform_neighbor_sample_batched(
                    g2, _seed_df(spark).repartition(3), [2, 1], seed=7
                ).collect(),
            )
        )
        assert a == b and len(a) > 0

    def test_hop_frontier_chains(self, spark, small_graph):
        out = gnn.uniform_neighbor_sample_batched(
            small_graph, _seed_df(spark), [2, 2], seed=3
        ).toPandas()
        h0 = out[out.hop_id == 0]
        h1 = out[out.hop_id == 1]
        # hop-1 sources are exactly drawn from hop-0 destinations (per batch)
        for b in h1.batch_id.unique():
            front = set(h0[h0.batch_id == b].destinations)
            assert set(h1[h1.batch_id == b].sources) <= front

    def test_renumbered_graph_unrenumber(self, spark):
        edges = spark.createDataFrame(
            pd.DataFrame({"src": [100, 100, 200, 300], "dst": [200, 300, 300, 100]})
        )
        g = LinkGraph.from_edges(edges, directed=True, renumber=True)
        seeds = spark.createDataFrame(pd.DataFrame({"s": [100], "b": [0]}))
        out = gnn.uniform_neighbor_sample_batched(
            g, seeds, [2], seed=1, unrenumber=True
        ).toPandas()
        assert set(out.sources) <= {100, 200, 300}
        assert set(out.destinations) <= {100, 200, 300}


class TestFeatureStore:
    def test_numpy_backend_matches_reference_semantics(self):
        fs = gnn.FeatureStore()
        feat = np.arange(20, dtype="float64").reshape(10, 2)
        fs.add_data(feat, "node", "x")
        got = fs.get_data(np.array([3, 1, 7]), "node", "x")
        assert np.array_equal(got, feat[[3, 1, 7]])
        assert list(fs.get_feature_list().keys()) == ["x"]

    def test_spark_backend_gather(self, spark):
        fs = gnn.FeatureStore(backend="spark", spark=spark)
        feat = np.arange(20, dtype="float64").reshape(10, 2)
        fs.add_data(feat, "node", "x")
        got = fs.get_data(np.array([9, 0, 4]), "node", "x")
        assert np.allclose(got, feat[[9, 0, 4]])
        # distributed gather keeps it a DataFrame
        idx = spark.createDataFrame(pd.DataFrame({"index": [1, 2]}))
        df = fs.get_data_frame(idx, "node", "x")
        assert sorted(r["index"] for r in df.collect()) == [1, 2]

    def test_error_paths(self, spark):
        fs = gnn.FeatureStore()
        fs.add_data(np.zeros((3, 2)), "node", "x")
        with pytest.raises(ValueError):
            fs.get_data(np.array([0]), "node", "nope")
        with pytest.raises(ValueError):
            fs.get_data(np.array([0]), "edge", "x")
        with pytest.raises(ValueError):
            gnn.FeatureStore(backend="torch")  # not available here
        fss = gnn.FeatureStore(backend="spark", spark=spark)
        fss.add_data(np.eye(4), "node", "x")
        with pytest.raises(IndexError):
            fss.get_data(np.array([99]), "node", "x")


class TestBulkSampler:
    def test_layout_renumber_and_empty_batch_drop(
        self, spark, small_graph, tmp_path
    ):
        out_dir = str(tmp_path / "samples")
        bs = gnn.BulkSampler(
            batch_size=2,
            output_path=out_dir,
            graph=small_graph,
            seeds_per_call=100,
            batches_per_partition=2,
            renumber=True,
            fanout_vals=[2, 1],
            seed=7,
        )
        # batch 1 holds only vertex 7 — absent from the graph → batch
        # samples nothing and must be dropped + survivors renumbered
        bs.add_batches(
            pd.DataFrame(
                {"v": [0, 1, 7, 3, 4, 6], "b": [0, 0, 1, 2, 3, 3]}
            ),
            "v",
            "b",
        )
        bs.flush()
        res = spark.read.parquet(out_dir).toPandas()
        # input batches 0,2,3 survive → contiguous ids 0,1,2 from min 0
        assert sorted(res.batch_id.unique()) == [0, 1, 2]
        # ≤2 batches per partition dir
        parts = sorted(glob.glob(out_dir + "/batch_partition=*"))
        assert [p.split("=")[-1] for p in parts] == ["0", "1"]
        for bp in res.batch_partition.unique():
            assert res[res.batch_partition == bp].batch_id.nunique() <= 2
        # renumber map: dense per-batch ids; renumbered edges map back
        rmap = spark.read.parquet(bs.renumber_map_path).toPandas()
        for b, grp in rmap.groupby("batch_id"):
            assert sorted(grp.map_id) == list(range(len(grp)))
        real = {
            (r["src"], r["dst"])
            for r in small_graph.edges.select("src", "dst").collect()
        }
        back = {}
        for row in rmap.itertuples():
            back[(row.batch_id, row.map_id)] = row.vertex
        for row in res.itertuples():
            s = back[(row.batch_id, row.sources)]
            d = back[(row.batch_id, row.destinations)]
            assert (s, d) in real

    def test_auto_flush_and_size(self, spark, small_graph, tmp_path):
        out_dir = str(tmp_path / "af")
        bs = gnn.BulkSampler(
            batch_size=1,
            output_path=out_dir,
            graph=small_graph,
            seeds_per_call=3,
            batches_per_partition=2,
            fanout_vals=[1],
        )
        bs.add_batches(
            pd.DataFrame({"v": [0, 1], "b": [0, 1]}), "v", "b"
        )
        assert bs.size == 2  # below threshold: nothing written yet
        assert not glob.glob(out_dir + "/batch_partition=*")
        bs.add_batches(pd.DataFrame({"v": [5], "b": [2]}), "v", "b")
        # threshold hit → auto-flush drained the pending seeds
        assert bs.size == 0
        assert glob.glob(out_dir + "/batch_partition=*")
        bs.flush()  # no pending seeds: must be a no-op

    def test_batches_per_partition_clamped(self, spark, small_graph, tmp_path):
        with pytest.warns(UserWarning, match="batches_per_partition"):
            bs = gnn.BulkSampler(
                batch_size=10,
                output_path=str(tmp_path / "c"),
                graph=small_graph,
                seeds_per_call=20,
                batches_per_partition=100,
            )
        assert bs.batches_per_partition == 2


def test_namespace_parity():
    """Reference ``cugraph.gnn`` exports FeatureStore
    (gnn/__init__.py) and ``cugraph.experimental`` exposes BulkSampler
    (experimental/gnn/__init__.py)."""
    import cugraph_spark.experimental as exp
    import cugraph_spark.gnn as g

    assert hasattr(g, "FeatureStore")
    assert hasattr(exp, "BulkSampler")


def test_bulk_sample_job_entry(spark, tmp_path):
    """jobs/bulk_sample_job.py end-to-end on the synthetic table (the
    spark-submit training-data export; session reused in-process)."""
    import jobs.bulk_sample_job as job

    out = str(tmp_path / "mb")
    job.main(
        [
            "--synthetic", "sf0.001",
            "--output", out,
            "--fanout", "2,1",
            "--batch-size", "16",
            "--renumber",
        ]
    )
    res = spark.read.parquet(out)
    assert res.count() > 0
    assert {"sources", "destinations", "hop_id", "batch_id"} <= set(res.columns)
