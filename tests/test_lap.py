"""Linear assignment (Hungarian / JV) tests — brute-force parity on small
matrices, rectangular padding, and the Spark bipartite-graph path
(reference ``linear_assignment/lap.py``)."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators.lap import dense_hungarian, hungarian


def _brute(a: np.ndarray):
    n_r, n_c = a.shape
    best, best_perm = None, None
    for perm in itertools.permutations(range(n_c), n_r):
        c = sum(a[i, j] for i, j in enumerate(perm))
        if best is None or c < best - 1e-12:
            best, best_perm = c, perm
    return best, best_perm


def test_dense_square_matches_bruteforce():
    rng = np.random.default_rng(7)
    for n in (2, 3, 5, 7):
        for _ in range(5):
            a = rng.uniform(0, 100, size=(n, n))
            cost, assign = dense_hungarian(a.ravel(), n, n)
            exact, _ = _brute(a)
            assert cost == pytest.approx(exact, abs=1e-9)
            # assignment is a permutation achieving that cost
            assert sorted(assign) == list(range(n))
            assert a[np.arange(n), assign].sum() == pytest.approx(cost)


def test_dense_rectangular_more_jobs():
    rng = np.random.default_rng(11)
    a = rng.uniform(0, 50, size=(3, 6))
    cost, assign = dense_hungarian(a.ravel(), 3, 6)
    exact, _ = _brute(a)
    assert cost == pytest.approx(exact, abs=1e-9)
    assert len(set(assign)) == 3 and all(0 <= j < 6 for j in assign)


def test_dense_rectangular_more_workers():
    rng = np.random.default_rng(13)
    a = rng.uniform(0, 50, size=(5, 3))
    cost, assign = dense_hungarian(a.ravel(), 5, 3)
    # 3 workers matched, 2 unassigned (-1)
    matched = [(i, j) for i, j in enumerate(assign) if j >= 0]
    assert len(matched) == 3
    assert sorted(j for _, j in matched) == [0, 1, 2]
    assert sum(a[i, j] for i, j in matched) == pytest.approx(cost)
    # optimal among all ways to pick 3 workers for the 3 jobs
    best = min(
        sum(a[i, j] for i, j in zip(rows_pick, perm))
        for rows_pick in itertools.combinations(range(5), 3)
        for perm in itertools.permutations(range(3))
    )
    assert cost == pytest.approx(best, abs=1e-9)


def test_dense_integer_costs_and_determinism():
    a = np.array([[4, 1, 3], [2, 0, 5], [3, 2, 2]], dtype=float)
    c1, s1 = dense_hungarian(a.ravel(), 3, 3)
    c2, s2 = dense_hungarian(a.ravel(), 3, 3)
    assert c1 == c2 == 5.0  # 1 + 2 + 2
    assert list(s1) == list(s2)


def test_hungarian_bipartite_graph(spark):
    # workers 0..3, jobs 10..13; cost hand-built with a unique optimum
    costs = {
        (0, 10): 9.0, (0, 11): 2.0, (0, 12): 7.0, (0, 13): 8.0,
        (1, 10): 6.0, (1, 11): 4.0, (1, 12): 3.0, (1, 13): 7.0,
        (2, 10): 5.0, (2, 11): 8.0, (2, 12): 1.0, (2, 13): 8.0,
        (3, 10): 7.0, (3, 11): 6.0, (3, 12): 9.0, (3, 13): 4.0,
    }
    rows = [(s, d, w) for (s, d), w in costs.items()]
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE"),
        weight="weight",
    )
    workers = spark.createDataFrame([(i,) for i in range(4)], "v LONG")
    total, df = hungarian(g, workers)
    got = {r["vertex"]: r["assignment"] for r in df.collect()}
    # brute force over the dense block
    a = np.array([[costs[(i, 10 + j)] for j in range(4)] for i in range(4)])
    exact, perm = _brute(a)
    assert total == pytest.approx(exact)
    assert got == {i: 10 + perm[i] for i in range(4)}


def test_hungarian_missing_edges_stay_unassigned(spark):
    # worker 1 connects only to job 10, worker 0 to both; worker 2 has no
    # edge to any job that remains after the optimum → null assignment
    rows = [
        (0, 10, 5.0), (0, 11, 1.0),
        (1, 10, 2.0),
        (2, 12, 3.0),
    ]
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE"),
        weight="weight",
    )
    workers = spark.createDataFrame([(0,), (1,), (2,)], "v LONG")
    total, df = hungarian(g, workers)
    got = {r["vertex"]: r["assignment"] for r in df.collect()}
    assert got == {0: 11, 1: 10, 2: 12}
    assert total == pytest.approx(6.0)


def test_hungarian_requires_weights(spark):
    g = LinkGraph.from_edges(
        spark.createDataFrame([(0, 10), (1, 11)], "src LONG, dst LONG")
    )
    workers = spark.createDataFrame([(0,), (1,)], "v LONG")
    with pytest.raises(ValueError, match="weights"):
        hungarian(g, workers)


def test_hungarian_max_cells_gate(spark):
    rows = [(i, 100 + j, float(i + j)) for i in range(4) for j in range(4)]
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE"),
        weight="weight",
    )
    workers = spark.createDataFrame([(i,) for i in range(4)], "v LONG")
    with pytest.raises(ValueError, match="max_cells"):
        hungarian(g, workers, max_cells=8)
