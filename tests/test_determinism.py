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
