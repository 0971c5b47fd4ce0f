"""Cores — core number (iterative peeling) and k-core subgraph.

Reference parity:
- core_number: ``cores/core_number.py:23-92`` — DF[vertex, core_number],
  ``degree_type ∈ {incoming, outgoing, bidirectional}``.
- k_core: ``cores/k_core.py:42-158`` — the subgraph induced on vertices
  with core_number ≥ k.

Algorithm: distributed peeling — repeatedly remove all vertices whose
current degree < k while raising k; every removed vertex's core number is
the k at which it fell. Each round is one degree aggregation + one
anti-join; rounds are bounded by the degeneracy, and each vertex is
removed exactly once, so total work is O(E · rounds) scans of a shrinking
edge set (localCheckpoint per round keeps the shrinking edge DataFrame's
lineage flat).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, VID, LinkGraph, truncate_state


def _degree_edges(graph: LinkGraph, degree_type: str) -> DataFrame:
    """Edge view whose per-src count is the requested degree."""
    e = graph.edges.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    if degree_type == "outgoing":
        return e
    if degree_type == "incoming":
        return e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    # bidirectional: undirected simple-graph degree
    return (
        e.union(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))).distinct()
    )


def core_number(
    graph: LinkGraph,
    degree_type: str = "bidirectional",
    unrenumber: bool = True,
) -> DataFrame:
    """DF[vertex, core_number] via peeling."""
    if degree_type not in ("incoming", "outgoing", "bidirectional"):
        raise ValueError(f"invalid degree_type {degree_type!r}")
    n_part = graph.num_partitions
    edges = truncate_state(_degree_edges(graph, degree_type), n_part, SRC)

    # isolated vertices (no qualifying edges) have core 0
    result = graph.vertices().select(VID, F.lit(0).alias("core_number"))
    live = edges
    k = 1
    while True:
        if live.limit(1).count() == 0:
            break
        deg = live.groupBy(SRC).agg(F.count("*").alias("_d"))
        peel = deg.filter(F.col("_d") < k).select(F.col(SRC).alias(VID))
        if peel.limit(1).count() == 0:
            # everyone remaining has degree ≥ k → their core is ≥ k
            survivors = deg.select(F.col(SRC).alias(VID))
            old = result
            result = truncate_state(
                result.join(survivors.withColumn("_k", F.lit(k)), VID, "left")
                .select(
                    VID,
                    F.coalesce(F.col("_k"), F.col("core_number")).alias("core_number"),
                ),
                n_part,
                VID,
            )
            old.unpersist()
            k += 1
            continue
        peel = truncate_state(peel)
        old_live = live
        live = truncate_state(
            live.join(peel.withColumnRenamed(VID, SRC), SRC, "left_anti")
            .join(peel.withColumnRenamed(VID, DST), DST, "left_anti"),
            n_part,
            SRC,
        )
        old_live.unpersist()
        peel.unpersist()

    out = result.select(
        F.col(VID).alias("vertex"), F.col("core_number").cast("int").alias("core_number")
    )
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    return out


def k_core(
    graph: LinkGraph,
    k: int,
    core_numbers: DataFrame | None = None,
    unrenumber: bool = True,
) -> DataFrame:
    """Edge list [src, dst, weight] of the k-core subgraph (both endpoints
    have core_number ≥ k), per ``k_core.py:42-158``."""
    cn = core_numbers
    if cn is None:
        cn = core_number(graph, unrenumber=False)
    keep = cn.filter(F.col("core_number") >= k).select(
        F.col("vertex").alias(VID)
    )
    e = (
        graph.edges.join(keep.withColumnRenamed(VID, SRC), SRC, "left_semi")
        .join(keep.withColumnRenamed(VID, DST), DST, "left_semi")
    )
    if unrenumber:
        e = graph.unrenumber(e, SRC)
        e = graph.unrenumber(e, DST)
    return e
