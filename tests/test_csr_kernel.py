"""Per-partition COO→CSR Arrow kernels (cugraph_spark/csr.py).

Reference parity: ``create_graph_from_edgelist_impl.cuh:513-590`` (COO→CSR
per-partition compression) and ``per_v_transform_reduce_incoming_outgoing_e``
(the SpMV gather).  The CSR structure must reproduce the adjacency exactly,
and the CSR-gather PageRank must match the DataFrame-superstep PageRank to
float tolerance on identical inputs.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cugraph_spark.csr import csr_partitions, pagerank_csr
from cugraph_spark.datagen import derived_edges
from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import pagerank


@pytest.fixture(scope="module")
def small_graph(spark):
    edges = derived_edges(spark, "/root/testdata/sf0.001", num_vertices=200)
    return LinkGraph.from_edges(edges, directed=True)


def test_csr_roundtrip_matches_adjacency(spark, small_graph):
    """Decompressing every partition's CSR yields exactly the edge list."""
    n_part = small_graph.num_partitions
    rows = csr_partitions(small_graph, n_part).collect()
    assert len(rows) <= n_part
    rebuilt = []
    for r in rows:
        vids = np.asarray(r["vids"])
        offs = np.asarray(r["offsets"])
        idx = np.asarray(r["indices"])
        # every source hashed to its own partition
        assert (vids % n_part == r["pid"]).all()
        # offsets are a proper monotone prefix over indices
        assert offs[0] == 0 and offs[-1] == len(idx)
        assert (np.diff(offs) > 0).all()  # DCSR: zero-degree rows absent
        for v, lo, hi in zip(vids, offs[:-1], offs[1:]):
            rebuilt += [(int(v), int(d)) for d in idx[lo:hi]]
    expect = {
        (r["src"], r["dst"]) for r in small_graph.edges.select("src", "dst").collect()
    }
    assert set(rebuilt) == expect and len(rebuilt) == len(expect)


def test_csr_chunking_splits_rows_and_preserves_adjacency(spark, small_graph):
    """A tiny ``max_chunk_edges`` forces every partition into multiple
    chunk rows; the union of chunks must still decompress to exactly the
    edge list, with per-chunk rebased offsets."""
    n_part = small_graph.num_partitions
    rows = csr_partitions(small_graph, n_part, max_chunk_edges=16).collect()
    assert len(rows) > n_part  # actually chunked
    per_pid = {}
    rebuilt = []
    for r in rows:
        vids = np.asarray(r["vids"])
        offs = np.asarray(r["offsets"])
        idx = np.asarray(r["indices"])
        assert offs[0] == 0 and offs[-1] == len(idx)
        # bound holds unless a single vertex's degree alone exceeds it
        assert len(idx) <= 16 or len(vids) == 1
        per_pid.setdefault(r["pid"], []).append(vids)
        for v, lo, hi in zip(vids, offs[:-1], offs[1:]):
            rebuilt += [(int(v), int(d)) for d in idx[lo:hi]]
    # chunks of one pid cover disjoint, ascending vid ranges
    for chunks in per_pid.values():
        flat = np.concatenate(chunks)
        assert (np.diff(flat) > 0).all() or len(flat) == 1
    expect = {
        (r["src"], r["dst"]) for r in small_graph.edges.select("src", "dst").collect()
    }
    assert set(rebuilt) == expect and len(rebuilt) == len(expect)


def test_pagerank_csr_multi_chunk_parity(spark, small_graph):
    """CSR-gather PageRank over FORCED multi-chunk partitions ≡ the
    DataFrame path (the gather must consume all chunk rows per pid)."""
    ref = (
        pagerank(small_graph, tol=1e-10, max_iter=40)
        .ranks.withColumnRenamed("pagerank", "p_ref")
    )
    got = pagerank_csr(
        small_graph, tol=1e-10, max_iter=40, max_chunk_edges=16
    )
    diff = (
        ref.join(got, "vertex")
        .agg(F.max(F.abs(F.col("p_ref") - F.col("pagerank"))))
        .collect()[0][0]
    )
    assert diff < 1e-12


def test_pagerank_csr_matches_dataframe_path(spark, small_graph):
    """CSR-gather PageRank ≡ DataFrame-superstep PageRank (allclose 1e-12;
    the reference contract is 1e-6, ``tests/test_pagerank.py``-style)."""
    ref = (
        pagerank(small_graph, tol=1e-10, max_iter=100)
        .ranks.withColumnRenamed("pagerank", "p_ref")
    )
    got = pagerank_csr(small_graph, tol=1e-10, max_iter=100)
    diff = (
        ref.join(got, "vertex")
        .agg(F.max(F.abs(F.col("p_ref") - F.col("pagerank"))))
        .collect()[0][0]
    )
    assert got.count() == small_graph.number_of_vertices()
    assert diff < 1e-12
