"""IVF ANN (ivf_cells/ivf_topk) and embedding-cosine near-dup
(embedding_neardup): recall against the exact brute-force oracle,
sub-quadratic candidate generation, and determinism of the coarse
quantizer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cugraph_spark import vector as vec


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """Same construction as the LSH recall fixture: 10 tight clusters in
    64-dim, 200 vectors — each vector's true nearest neighbors are its
    cluster mates."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(200):
        c = centers[i % 10]
        v = c + 0.05 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")


def _recall(exact_rows, approx_rows):
    truth, got = {}, {}
    for r in exact_rows:
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in approx_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    return hits / sum(len(v) for v in truth.values())


def test_ivf_topk_high_recall_on_clustered(clustered_emb):
    k = 5
    exact = vec.cosine_topk(clustered_emb, k=k).collect()
    approx = vec.ivf_topk(clustered_emb, k=k, n_cells=16, n_probe=4).collect()
    r = _recall(exact, approx)
    assert r >= 0.9, r


def test_ivf_candidates_sub_quadratic(clustered_emb):
    """n_probe/n_cells bounds the candidate fraction: with 4 of 16 cells
    probed, per-query candidates must stay well under the corpus size."""
    assign, cent = vec.ivf_cells(clustered_emb, n_cells=16)
    n = clustered_emb.count()
    sizes = assign.groupBy("cell").count().collect()
    assert sum(r["count"] for r in sizes) == n  # total assignment
    # the 4 biggest cells (a worst-case probe set) are < the whole corpus
    top4 = sum(sorted((r["count"] for r in sizes), reverse=True)[:4])
    assert top4 < n


def test_ivf_cells_deterministic(clustered_emb):
    a1, _ = vec.ivf_cells(clustered_emb, n_cells=16)
    a2, _ = vec.ivf_cells(clustered_emb, n_cells=16)
    assert a1.exceptAll(a2).count() == 0
    assert a2.exceptAll(a1).count() == 0


def test_ivf_rank_has_no_duplicate_neighbors(clustered_emb):
    out = vec.ivf_topk(clustered_emb, k=5, n_cells=16, n_probe=4)
    dup = out.groupBy("query_id", "neighbor_id").count().filter(F.col("count") > 1)
    assert dup.count() == 0


def test_embedding_neardup_finds_cluster_pairs(clustered_emb):
    """High-threshold near-dup: every returned pair must truly clear the
    threshold (verified exact), and recall vs the exact pair set must be
    high on clustered data."""
    thr = 0.9
    got = vec.embedding_neardup(clustered_emb, threshold=thr).collect()
    pdf = clustered_emb.orderBy("vec_id").toPandas()
    M = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = np.round(M @ M.T, 4)
    true_pairs = {
        (a, b)
        for a in range(len(M))
        for b in range(a + 1, len(M))
        if sims[a, b] >= thr
    }
    got_pairs = {(r.vec_a, r.vec_b) for r in got}
    # precision must be exact (candidates are verified with exact cosine)
    assert got_pairs <= true_pairs
    # recall: near-identical vectors collide on >=1 of 8 bands w.h.p.
    assert len(got_pairs) / max(1, len(true_pairs)) >= 0.85
