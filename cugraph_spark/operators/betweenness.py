"""Betweenness centrality — batched Brandes.

Reference parity: ``python/cugraph/cugraph/centrality/
betweenness_centrality.py:31-359`` (``k`` sampled sources, ``normalized``,
``seed``); C++ ``cpp/src/centrality/betweenness_centrality_impl.cuh``.

Algorithm: Brandes (2001), all sources batched — state is keyed by
``(source, vertex)`` so ONE BFS wave serves every source simultaneously
(this is how the expensive per-source fan-out becomes a join workload
instead of a driver loop over sources):

1. forward: level-synchronous BFS accumulating path counts
   ``σ(s, v) = Σ_pred σ(s, u)``; one join+groupBy per depth level.
2. backward: from the deepest level upward, accumulate dependencies
   ``δ(s, v) = Σ_{w: succ} σ(s,v)/σ(s,w) · (1 + δ(s,w))``.
3. ``bc(v) = Σ_{s≠v} δ(s, v)``, rescaled by n/k for sampled sources and
   1/((n−1)(n−2)) when normalized (directed convention; halve for
   undirected semantics downstream).

Cost: O(diameter) supersteps, each sized k·V (state) + k·E (expansion) —
``k`` is the lever that bounds the batch at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, VID, LinkGraph, truncate_state


def betweenness_centrality(
    graph: LinkGraph,
    k: int | None = None,
    normalized: bool = True,
    seed: int = 42,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[vertex, betweenness_centrality]."""
    n_part = graph.num_partitions
    n = graph.number_of_vertices()
    edges = graph.edges.select(SRC, DST)

    sources = graph.vertices().select(F.col(VID).alias("s"))
    if isinstance(k, (list, tuple)):
        # explicit source list (external ids), as the reference's `k` allows
        ext = graph.spark.createDataFrame([(int(v),) for v in k], "ext_id LONG")
        if graph.renumber_map is not None:
            ext = ext.join(graph.renumber_map, "ext_id").select(F.col(VID).alias("s"))
        else:
            ext = ext.select(F.col("ext_id").alias("s"))
        sources = ext
        n_sources = len(k)
    elif k is not None and k < n:
        sources = (
            sources.withColumn("_r", F.rand(seed)).orderBy("_r", "s").limit(k).drop("_r")
        )
        n_sources = k
    else:
        n_sources = n

    # ---- forward: level-synchronous multi-source BFS with sigma ----------
    frontier = truncate_state(
        sources.select("s", F.col("s").alias("v"), F.lit(1.0).alias("sigma")),
        n_part,
        "v",
    )
    layers = [frontier]  # layers[d] = DF[s, v, sigma]
    seen = frontier.select("s", "v")
    seen = truncate_state(seen, n_part, "v")

    while True:
        expanded = (
            edges.join(frontier.withColumnRenamed("v", SRC), SRC)
            .groupBy("s", F.col(DST).alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = truncate_state(
            expanded.join(seen, ["s", "v"], "left_anti"), n_part, "v"
        )
        if nxt.limit(1).count() == 0:
            nxt.unpersist()
            break
        layers.append(nxt)
        old_seen = seen
        seen = truncate_state(seen.union(nxt.select("s", "v")), n_part, "v")
        old_seen.unpersist()
        frontier = nxt

    # ---- backward: dependency accumulation, deepest level first ----------
    acc = None  # running Σ_s δ(s, v) per v
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
        contrib = (
            edges.join(layer_d.select("s", F.col("v").alias(SRC), F.col("sigma").alias("sig_v")), SRC)
            .join(
                w_state.select(
                    "s", F.col("v").alias(DST), F.col("sigma").alias("sig_w"), "delta"
                ),
                ["s", DST],
            )
            .groupBy("s", F.col(SRC).alias("v"))
            .agg(
                F.sum(
                    (F.col("sig_v") / F.col("sig_w")) * (F.lit(1.0) + F.col("delta"))
                ).alias("delta")
            )
        )
        delta_d = truncate_state(contrib, n_part, "v")
        # accumulate into bc (exclude the source itself)
        part = delta_d.filter(F.col("s") != F.col("v")).groupBy("v").agg(
            F.sum("delta").alias("bc_part")
        )
        acc = part if acc is None else acc.union(part)
        if d % 8 == 0 and acc is not None:
            acc = truncate_state(acc.groupBy("v").agg(F.sum("bc_part").alias("bc_part")), n_part, "v")
        if delta_next is not None:
            delta_next.unpersist()
        delta_next = delta_d

    if acc is None:
        bc = graph.vertices().select(
            F.col(VID).alias("vertex"), F.lit(0.0).alias("betweenness_centrality")
        )
    else:
        totals = acc.groupBy("v").agg(F.sum("bc_part").alias("bc"))
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
