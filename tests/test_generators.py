"""generators.rmat / multi_rmat — reference option surface over the
deterministic counter-hash R-MAT kernel."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cugraph_spark import generators


def test_rmat_edge_frame_and_options(spark):
    df = generators.rmat(
        6, 200, seed=7, create_using=None,
        include_edge_weights=True, minimum_weight=0.5, maximum_weight=2.5,
        include_edge_ids=True,
        include_edge_types=True, min_edge_type_value=0, max_edge_type_value=3,
    )
    assert df.columns == ["src", "dst", "weights", "edge_id", "edge_type"]
    assert df.count() == 200
    stats = df.agg(
        F.min("weights"), F.max("weights"), F.min("edge_type"),
        F.max("edge_type"), F.count_distinct("edge_id"),
    ).first()
    assert 0.5 <= stats[0] and stats[1] <= 2.5
    assert 0 <= stats[2] and stats[3] <= 3
    assert stats[4] == 200  # dense unique edge ids
    # determinism: same args -> same frame
    df2 = generators.rmat(
        6, 200, seed=7, create_using=None,
        include_edge_weights=True, minimum_weight=0.5, maximum_weight=2.5,
        include_edge_ids=True,
        include_edge_types=True, min_edge_type_value=0, max_edge_type_value=3,
    )
    assert df.exceptAll(df2).count() == 0


def test_rmat_clip_and_flip_and_bounds(spark):
    df = generators.rmat(5, 150, seed=3, clip_and_flip=True, create_using=None)
    mx = df.agg(F.max("src"), F.max("dst"), F.min(F.col("src") >= F.col("dst"))).first()
    assert mx[0] < 32 and mx[1] < 32
    assert mx[2] is True  # lower triangle


def test_rmat_builds_graph_and_validates(spark):
    G = generators.rmat(5, 100, seed=1)
    assert G.is_directed()
    assert G.number_of_edges() > 0
    with pytest.raises(ValueError, match="minimum_weight"):
        generators.rmat(5, 10, include_edge_weights=True)
    with pytest.raises(ValueError, match="min_edge_type_value"):
        generators.rmat(5, 10, include_edge_types=True)
    with pytest.raises(TypeError, match="create_using"):
        generators.rmat(5, 10, create_using=42)


def test_multi_rmat(spark):
    gs = generators.multi_rmat(2, 4, 5, 2, seed=11)
    assert len(gs) == 2
    for g in gs:
        assert g.number_of_edges() > 0
