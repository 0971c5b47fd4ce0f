"""Link prediction — Jaccard / Overlap / Sorensen coefficients.

Reference parity: ``python/cugraph/cugraph/link_prediction/jaccard.py:23-209``
(also ``overlap.py``, ``sorensen.py``); C++ core
``cpp/src/link_prediction/similarity_impl.cuh`` intersects destination
neighbor lists per vertex pair. Output schema ``DF[first, second, <coeff>]``.
Default pair set = the two-hop pairs, as in the reference
(``jaccard.py`` uses ``get_two_hop_neighbors()`` when ``vertex_pair`` is
None).

Spark plan: neighbor sets over the undirected view; pair candidates get
|N(a)∩N(b)| by joining the edge table with itself on the shared endpoint
and counting wedges per (a, b) — a pure join+groupBy plan that never
materializes adjacency arrays (no collect_list skew risk at web scale);
degrees are a broadcast-sized [v, deg] table joined twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, VID, LinkGraph


def _undirected_edges(graph: LinkGraph) -> DataFrame:
    """Symmetric, deduped, loop-free neighbor relation [src, dst]."""
    e = graph.edges.select(SRC, DST)
    if graph.properties.directed:
        e = e.union(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))
    return e.filter(F.col(SRC) != F.col(DST)).distinct()


def _pair_stats(graph: LinkGraph, vertex_pair: DataFrame | None) -> DataFrame:
    """[first, second, isect, deg_first, deg_second] for each candidate pair.

    Wedge counting: an edge (a,w) and an edge (b,w) meeting at w contribute 1
    to |N(a)∩N(b)| — so ``E ⋈ E`` on the shared endpoint + groupBy(a,b).count
    computes all intersections in one shuffle.
    """
    und = _undirected_edges(graph).persist()
    deg = und.groupBy(F.col(SRC).alias("v")).agg(F.count("*").alias("deg"))

    e1 = und.select(F.col(SRC).alias("first"), F.col(DST).alias("w"))
    e2 = und.select(F.col(SRC).alias("second"), F.col(DST).alias("w"))
    wedges = (
        e1.join(e2, "w")
        .filter(F.col("first") < F.col("second"))
        .groupBy("first", "second")
        .agg(F.count("*").alias("isect"))
    )
    if vertex_pair is not None:
        pairs = vertex_pair.select(
            F.least("first", "second").alias("first"),
            F.greatest("first", "second").alias("second"),
        ).distinct()
        wedges = pairs.join(wedges, ["first", "second"], "left").fillna(0, ["isect"])

    out = (
        wedges.join(deg.withColumnRenamed("v", "first").withColumnRenamed("deg", "deg_first"), "first")
        .join(deg.withColumnRenamed("v", "second").withColumnRenamed("deg", "deg_second"), "second")
    )
    und.unpersist()
    return out


def _finish(graph: LinkGraph, df: DataFrame, unrenumber: bool) -> DataFrame:
    if unrenumber:
        df = graph.unrenumber(df, "first")
        df = graph.unrenumber(df, "second")
    return df


def jaccard(
    graph: LinkGraph, vertex_pair: DataFrame | None = None, unrenumber: bool = True
) -> DataFrame:
    """DF[first, second, jaccard_coeff] — |∩| / |∪| of neighbor sets."""
    st = _pair_stats(graph, vertex_pair)
    out = st.select(
        "first",
        "second",
        (
            F.col("isect")
            / (F.col("deg_first") + F.col("deg_second") - F.col("isect"))
        ).alias("jaccard_coeff"),
    )
    return _finish(graph, out, unrenumber)


def overlap(
    graph: LinkGraph, vertex_pair: DataFrame | None = None, unrenumber: bool = True
) -> DataFrame:
    """DF[first, second, overlap_coeff] — |∩| / min(|N(a)|, |N(b)|)."""
    st = _pair_stats(graph, vertex_pair)
    out = st.select(
        "first",
        "second",
        (F.col("isect") / F.least("deg_first", "deg_second")).alias("overlap_coeff"),
    )
    return _finish(graph, out, unrenumber)


def sorensen(
    graph: LinkGraph, vertex_pair: DataFrame | None = None, unrenumber: bool = True
) -> DataFrame:
    """DF[first, second, sorensen_coeff] — 2|∩| / (|N(a)| + |N(b)|)."""
    st = _pair_stats(graph, vertex_pair)
    out = st.select(
        "first",
        "second",
        (
            F.lit(2.0) * F.col("isect") / (F.col("deg_first") + F.col("deg_second"))
        ).alias("sorensen_coeff"),
    )
    return _finish(graph, out, unrenumber)
