"""Betweenness centrality (vertex + edge) — batched Brandes.

Reference parity: ``python/cugraph/cugraph/centrality/
betweenness_centrality.py:31-359`` (vertex form: ``k`` sampled sources,
``normalized``, ``seed``; edge form ``:200-359`` →
DF[src, dst, betweenness_centrality]); C++
``cpp/src/centrality/betweenness_centrality_impl.cuh``.

Algorithm: Brandes (2001), all sources batched — state is keyed by
``(source, vertex)`` so ONE BFS wave serves every source simultaneously
(this is how the expensive per-source fan-out becomes a join workload
instead of a driver loop over sources):

1. forward: level-synchronous BFS accumulating path counts
   ``σ(s, v) = Σ_pred σ(s, u)``; one join+groupBy per depth level.
2. backward: from the deepest level upward, accumulate dependencies
   ``δ(s, v) = Σ_{w: succ} σ(s,v)/σ(s,w) · (1 + δ(s,w))``; the per-edge
   term BEFORE the groupBy(v) is exactly the edge-betweenness increment,
   so the edge variant shares the whole pass.
3. ``bc(v) = Σ_{s≠v} δ(s, v)`` (vertices) / ``bc(e) = Σ_s term(s, e)``
   (edges), rescaled by n/k for sampled sources and 1/((n−1)(n−2))
   (vertices) or 1/(n(n−1)) (edges) when normalized.

Memory discipline (VERDICT r01 #10): BFS layers are SPILLED TO PARQUET as
the forward pass produces them and re-read lazily in the backward pass —
holding O(diameter) cached k·V frames simultaneously is a memory cliff at
k=thousands on a big graph.  Every cached frame (frontier, seen, deltas,
accumulator compactions) is unpersisted as soon as its consumer has run.

Cost: O(diameter) supersteps, each sized k·V (state) + k·E (expansion) —
``k`` is the lever that bounds the batch at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, VID, LinkGraph, truncate_state
from ..spill import spill_cleanup, spill_dir


def _forward_layers(graph: LinkGraph, sources: DataFrame, spill_root: str):
    """Run the multi-source sigma BFS; spill each layer [s, v, sigma] to
    ``<spill_root>/layer_<d>.parquet`` (a shared-filesystem URI from
    :func:`cugraph_spark.spill.spill_dir`) and return the list of frames."""
    spark = graph.spark
    n_part = graph.num_partitions
    edges = graph.edges.select(SRC, DST)

    frontier = truncate_state(
        sources.select("s", F.col("s").alias("v"), F.lit(1.0).alias("sigma")),
        n_part,
        "v",
    )
    paths = []

    def _spill(df: DataFrame, d: int) -> str:
        p = f"{spill_root}/layer_{d:04d}.parquet"
        df.write.mode("overwrite").parquet(p)
        return p

    paths.append(_spill(frontier, 0))
    seen = truncate_state(frontier.select("s", "v"), n_part, "v")

    d = 0
    while True:
        expanded = (
            edges.join(frontier.withColumnRenamed("v", SRC), SRC)
            .groupBy("s", F.col(DST).alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = truncate_state(expanded.join(seen, ["s", "v"], "left_anti"), n_part, "v")
        if nxt.limit(1).count() == 0:
            nxt.unpersist()
            break
        d += 1
        paths.append(_spill(nxt, d))
        old_seen, old_frontier = seen, frontier
        seen = truncate_state(seen.union(nxt.select("s", "v")), n_part, "v")
        old_seen.unpersist()
        old_frontier.unpersist()
        frontier = nxt
    frontier.unpersist()
    seen.unpersist()
    return [spark.read.parquet(p) for p in paths]


def _resolve_sources(graph: LinkGraph, k, seed: int):
    n = graph.number_of_vertices()
    sources = graph.vertices().select(F.col(VID).alias("s"))
    if isinstance(k, (list, tuple)):
        # explicit source list (external ids), as the reference's `k` allows
        ext = graph.spark.createDataFrame([(int(v),) for v in k], "ext_id LONG")
        if graph.renumber_map is not None:
            ext = ext.join(graph.renumber_map, "ext_id").select(F.col(VID).alias("s"))
        else:
            ext = ext.select(F.col("ext_id").alias("s"))
        return ext, len(k), n
    if k is not None and k < n:
        sources = (
            sources.withColumn("_r", F.rand(seed)).orderBy("_r", "s").limit(k).drop("_r")
        )
        return sources, k, n
    return sources, n, n


def _brandes(graph: LinkGraph, k, seed: int, want_edges: bool):
    """Shared forward+backward pass.  Returns (vertex_totals [v, bc],
    edge_totals [src, dst, bc] or None, n_sources, n)."""
    n_part = graph.num_partitions
    edges = graph.edges.select(SRC, DST)
    sources, n_sources, n = _resolve_sources(graph, k, seed)

    spill_root = spill_dir(graph.spark, "bc_layers_")
    try:
        layers = _forward_layers(graph, sources, spill_root)

        vacc = None  # running Σ_s δ(s, v) pieces
        vacc_persisted = None
        eacc = None  # running per-edge pieces
        eacc_persisted = None
        delta_next: DataFrame | None = None  # δ for layer d+1
        for d in range(len(layers) - 2, -1, -1):
            layer_d = layers[d]
            layer_w = layers[d + 1]
            if delta_next is None:
                w_state = layer_w.select("s", "v", "sigma", F.lit(0.0).alias("delta"))
            else:
                w_state = (
                    layer_w.join(delta_next, ["s", "v"], "left")
                    .fillna(0.0, ["delta"])
                    .select("s", "v", "sigma", "delta")
                )
            terms = (
                edges.join(
                    layer_d.select(
                        "s", F.col("v").alias(SRC), F.col("sigma").alias("sig_v")
                    ),
                    SRC,
                )
                .join(
                    w_state.select(
                        "s", F.col("v").alias(DST), F.col("sigma").alias("sig_w"), "delta"
                    ),
                    ["s", DST],
                )
                .withColumn(
                    "term",
                    (F.col("sig_v") / F.col("sig_w")) * (F.lit(1.0) + F.col("delta")),
                )
            )
            if want_edges:
                epart = terms.groupBy(SRC, DST).agg(F.sum("term").alias("bc_part"))
                eacc = epart if eacc is None else eacc.union(epart)
            contrib = terms.groupBy("s", F.col(SRC).alias("v")).agg(
                F.sum("term").alias("delta")
            )
            delta_d = truncate_state(contrib, n_part, "v")
            # accumulate vertex bc (exclude the source itself)
            part = (
                delta_d.filter(F.col("s") != F.col("v"))
                .groupBy("v")
                .agg(F.sum("delta").alias("bc_part"))
            )
            vacc = part if vacc is None else vacc.union(part)
            if want_edges:
                # edge terms reference delta_next, which is about to be
                # replaced — compact eagerly every level so unpersisting
                # the old delta stays safe
                new_eacc = truncate_state(
                    eacc.groupBy(SRC, DST).agg(F.sum("bc_part").alias("bc_part")),
                    n_part,
                    SRC,
                )
                if eacc_persisted is not None:
                    eacc_persisted.unpersist()
                eacc = eacc_persisted = new_eacc
            if d % 8 == 0 and vacc is not None:
                new_vacc = truncate_state(
                    vacc.groupBy("v").agg(F.sum("bc_part").alias("bc_part")),
                    n_part,
                    "v",
                )
                if vacc_persisted is not None:
                    vacc_persisted.unpersist()
                vacc = vacc_persisted = new_vacc
            if delta_next is not None:
                delta_next.unpersist()
            delta_next = delta_d

        vertex_totals = None
        if vacc is not None:
            vertex_totals = truncate_state(
                vacc.groupBy("v").agg(F.sum("bc_part").alias("bc")), n_part, "v"
            )
        edge_totals = None
        if want_edges and eacc is not None:
            edge_totals = truncate_state(
                eacc.groupBy(SRC, DST).agg(F.sum("bc_part").alias("bc")), n_part, SRC
            )
        if delta_next is not None:
            delta_next.unpersist()
        if vacc_persisted is not None and vacc_persisted is not vertex_totals:
            vacc_persisted.unpersist()
        if eacc_persisted is not None and eacc_persisted is not edge_totals:
            eacc_persisted.unpersist()
        return vertex_totals, edge_totals, n_sources, n
    finally:
        spill_cleanup(graph.spark, spill_root)


def betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    normalized: bool = True,
    seed: int = 42,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[vertex, betweenness_centrality]."""
    totals, _, n_sources, n = _brandes(graph, k, seed, want_edges=False)
    if totals is None:
        bc = graph.vertices().select(
            F.col(VID).alias("vertex"), F.lit(0.0).alias("betweenness_centrality")
        )
    else:
        scale = 1.0
        if n_sources < n:
            scale *= n / float(n_sources)
        if normalized and n > 2:
            scale /= float((n - 1) * (n - 2))
        bc = (
            graph.vertices()
            .join(totals.withColumnRenamed("v", VID), VID, "left")
            .fillna(0.0, ["bc"])
            .select(
                F.col(VID).alias("vertex"),
                (F.col("bc") * F.lit(scale)).alias("betweenness_centrality"),
            )
        )
    if unrenumber:
        bc = graph.unrenumber(bc, "vertex")
    return bc


def edge_betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    normalized: bool = True,
    seed: int = 42,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[src, dst, betweenness_centrality] — reference
    ``betweenness_centrality.py:200-359``: the number of shortest paths
    crossing each edge, sampled over ``k`` sources, normalized by
    1/(n(n−1)) when requested."""
    _, etotals, n_sources, n = _brandes(graph, k, seed, want_edges=True)
    if etotals is None:
        out = graph.edges.select(
            SRC, DST, F.lit(0.0).alias("betweenness_centrality")
        )
    else:
        scale = 1.0
        if n_sources < n:
            scale *= n / float(n_sources)
        if normalized and n > 1:
            scale /= float(n * (n - 1))
        out = (
            graph.edges.select(SRC, DST)
            .join(etotals, [SRC, DST], "left")
            .fillna(0.0, ["bc"])
            .select(
                SRC, DST, (F.col("bc") * F.lit(scale)).alias("betweenness_centrality")
            )
        )
    if unrenumber:
        out = graph.unrenumber(out, SRC)
        out = graph.unrenumber(out, DST)
    return out
