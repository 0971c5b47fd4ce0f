"""Cross-parallelism determinism: the renumbering and canonical edge set
must be identical at any partition count (north-rule requirement; also a
regression test for the assign_dense_ids double-evaluation bug where
repartitionByRange re-sampling produced colliding ids)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import seeded_graph
from cugraph_spark.graph import LinkGraph


def test_renumber_identical_across_partition_counts(spark):
    rows = seeded_graph(400, 2400, seed=3)
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    maps = {}
    for n_part in (2, 7, 16):
        g = LinkGraph.from_edges(df, directed=True, num_partitions=n_part)
        maps[n_part] = {
            r["ext_id"]: r["id"] for r in g.renumber_map.collect()
        }
        # dense bijection: ids are exactly 0..V-1
        ids = sorted(maps[n_part].values())
        assert ids == list(range(len(ids)))
        g.unpersist()
    assert maps[2] == maps[7] == maps[16]


def test_edge_count_matches_input_distinct(spark):
    rows = seeded_graph(300, 1800, seed=5)
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    want = df.distinct().count()
    for n_part in (3, 11):
        g = LinkGraph.from_edges(df, directed=True, num_partitions=n_part)
        assert g.number_of_edges() == want, n_part
        g.unpersist()


def test_deterministic_walks_identical_across_partition_counts(spark):
    """deterministic=True walks are a pure function of (edges, starts,
    seed) — the modular-permutation hop selection must not depend on how
    the edge frame is partitioned (the property the walk_paths driver
    oracle relies on)."""
    from cugraph_spark.operators import random_walks

    rows = seeded_graph(200, 1200, seed=11)
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    starts = spark.createDataFrame([(v,) for v in range(0, 200, 23)], "v LONG")
    results = {}
    for n_part in (2, 7, 16):
        g = LinkGraph.from_edges(
            df, directed=True, renumber=False, num_partitions=n_part
        )
        out = random_walks(
            g, starts, max_depth=4, seed=13,
            deterministic=True, rank_modulus=200,
        )
        results[n_part] = sorted(
            (r.walk_id, r.step, r.vertex) for r in out.collect()
        )
        g.unpersist()
    assert results[2] == results[7] == results[16]
    assert len(results[2]) > len(starts.collect())  # walks actually extended
