"""Spectral clustering (operators/spectral.py).

Reference parity: the reference's own acceptance gate for spectral methods
is score-vs-random — ``tests/community/test_balanced_cut.py:63-101`` asserts
the clustering's edge-cut beats the MEAN edge-cut of 10 random assignments
(same shape for modularity in ``test_modularity.py``).  Mirrored here on
karate, plus exact numpy pins for the three ``analyzeClustering_*`` score
helpers and determinism of the full pipeline.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import (
    analyze_clustering_edge_cut,
    analyze_clustering_modularity,
    analyze_clustering_ratio_cut,
    spectral_balanced_cut_clustering,
    spectral_modularity_maximization_clustering,
)

from conftest import karate_edges


@pytest.fixture(scope="module")
def karate(spark):
    rows = [(int(s), int(d)) for s, d in karate_edges()]
    df = spark.createDataFrame(rows, "src LONG, dst LONG")
    return LinkGraph.from_edges(df, directed=True)


def _random_clusterings(spark, n_vertices: int, k: int, n: int = 10):
    for seed in range(n):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, k, size=n_vertices)
        # every cluster non-empty (the reference's random_call also
        # assigns uniformly over range(partitions))
        a[:k] = np.arange(k)
        yield spark.createDataFrame(
            [(int(v), int(c)) for v, c in enumerate(a)], "vertex LONG, cluster INT"
        )


@pytest.mark.parametrize("k", [2, 4])
def test_balanced_cut_beats_random(spark, karate, k):
    got = spectral_balanced_cut_clustering(karate, k).persist()
    assert got.count() == 34
    assert got.select("cluster").distinct().count() >= 2
    score = analyze_clustering_edge_cut(karate, k, got)
    rand = [
        analyze_clustering_edge_cut(karate, k, c)
        for c in _random_clusterings(spark, 34, k)
    ]
    assert score < sum(rand) / len(rand)


@pytest.mark.parametrize("k", [2, 4])
def test_modularity_maximization_beats_random(spark, karate, k):
    got = spectral_modularity_maximization_clustering(karate, k).persist()
    assert got.count() == 34
    score = analyze_clustering_modularity(karate, k, got)
    rand = [
        analyze_clustering_modularity(karate, k, c)
        for c in _random_clusterings(spark, 34, k)
    ]
    assert score > sum(rand) / len(rand)
    assert score > 0.2  # random hovers near 0; the faction structure is real


def test_score_helpers_match_numpy(spark, karate):
    """vertex%3 clustering: all three scores vs a dense numpy oracle."""
    k = 3
    cl = spark.createDataFrame(
        [(v, v % k) for v in range(34)], "vertex LONG, cluster INT"
    )
    A = np.zeros((34, 34))
    for s, d in karate_edges():
        A[s, d] = 1.0
    d = A.sum(1)
    two_m = d.sum()
    lab = np.arange(34) % k
    q = sum(
        A[np.ix_(lab == c, lab == c)].sum() / two_m
        - (d[lab == c].sum() / two_m) ** 2
        for c in range(k)
    )
    # cut/ratio-cut pin the SYMMETRIZED (both-direction) convention: the
    # cut weight is the sum over all symmetric adjacency entries (i, j)
    # with differing clusters — A already holds both directions, and
    # Σ_c A[c, ¬c] enumerates every ordered cross pair exactly once.
    cut_sym = sum(A[np.ix_(lab == c, lab != c)].sum() for c in range(k))
    ratio_sym = sum(
        2.0 * A[np.ix_(lab == c, lab != c)].sum() / (lab == c).sum()
        for c in range(k)
    )
    assert abs(analyze_clustering_modularity(karate, k, cl) - q) < 1e-9
    assert abs(analyze_clustering_edge_cut(karate, k, cl) - cut_sym) < 1e-9
    assert abs(analyze_clustering_ratio_cut(karate, k, cl) - ratio_sym) < 1e-9


def test_spectral_deterministic(spark, karate):
    a = spectral_balanced_cut_clustering(karate, 3).collect()
    b = spectral_balanced_cut_clustering(karate, 3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_spectral_validation(spark, karate):
    with pytest.raises(ValueError):
        spectral_balanced_cut_clustering(karate, 1)
    with pytest.raises(ValueError):
        spectral_modularity_maximization_clustering(karate, 2, num_eigen_vects=3)
