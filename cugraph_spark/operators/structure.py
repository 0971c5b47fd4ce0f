"""Structure operators — two-hop neighbors, induced subgraph, egonet,
random vertex selection, uniform neighbor sampling.

Reference parity:
- get_two_hop_neighbors: ``simpleGraph.py:722-766`` → DF[first, second].
- subgraph / induced_subgraph: ``community/subgraph_extraction.py:25-78``,
  ``induced_subgraph.py`` — edges with BOTH endpoints in the vertex set.
- ego_graph: ``community/egonet.py:52-238`` — induced subgraph of vertices
  within ``radius`` hops of the center.
- select_random_vertices: ``simpleGraph.py:767-803``.
- uniform_neighbor_sample: ``sampling/uniform_neighbor_sample.py:57-374``
  — per-hop fanout sampling; mapped to ``row_number() over
  (partitionBy(src) orderBy(rand(seed))) <= fanout`` (SURVEY §2.1's
  per_v_random_select prim mapping).

Scale: semi-joins everywhere (never materialize vertex lists driver-side);
sampling uses a seeded rand so results are reproducible for a fixed
partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..graph import DST, SRC, VID, LinkGraph, truncate_state


def two_hop_neighbors(graph: LinkGraph, unrenumber: bool = True) -> DataFrame:
    """DF[first, second] — distinct pairs connected by a 2-hop path
    (first → x → second, first ≠ second)."""
    e1 = graph.edges.select(F.col(SRC).alias("first"), F.col(DST).alias("_m"))
    e2 = graph.edges.select(F.col(SRC).alias("_m"), F.col(DST).alias("second"))
    out = (
        e1.join(e2, "_m")
        .filter(F.col("first") != F.col("second"))
        .select("first", "second")
        .distinct()
    )
    if unrenumber:
        out = graph.unrenumber(out, "first")
        out = graph.unrenumber(out, "second")
    return out


def induced_subgraph(
    graph: LinkGraph, vertices: DataFrame, unrenumber: bool = True
) -> DataFrame:
    """Edge list [src, dst, weight] induced on ``vertices`` (single column
    of external ids). Two semi-joins — no shuffle of the vertex list."""
    v = vertices.select(F.col(vertices.columns[0]).alias("_v"))
    if graph.renumber_map is not None:
        m = graph.renumber_map.select(F.col("ext_id").alias("_v"), VID)
        v = v.join(F.broadcast(m) if graph._map_small() else m, "_v").select(
            F.col(VID).alias("_v")
        )
    e = (
        graph.edges.join(
            v.withColumnRenamed("_v", SRC), SRC, "left_semi"
        ).join(v.withColumnRenamed("_v", DST), DST, "left_semi")
    )
    if unrenumber:
        e = graph.unrenumber(e, SRC)
        e = graph.unrenumber(e, DST)
    return e


def ego_graph(
    graph: LinkGraph, center, radius: int = 1, unrenumber: bool = True
) -> DataFrame:
    """Edge list of the subgraph induced on vertices within ``radius`` hops
    of ``center`` (over the underlying undirected connectivity, like the
    reference's networkx-compatible egonet)."""
    from .traversal import _internal_source

    c = _internal_source(graph, center)
    e = graph.edges.select(SRC, DST)
    und = e.union(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))

    reached = graph.spark.createDataFrame([(c,)], f"{VID} LONG")
    frontier = reached
    for _ in range(radius):
        nxt = truncate_state(
            und.join(frontier.withColumnRenamed(VID, SRC), SRC)
            .select(F.col(DST).alias(VID))
            .distinct()
            .join(reached, VID, "left_anti")
        )
        if nxt.limit(1).count() == 0:
            break
        reached = truncate_state(reached.union(nxt))
        frontier = nxt

    keep = reached
    out = (
        graph.edges.join(keep.withColumnRenamed(VID, SRC), SRC, "left_semi")
        .join(keep.withColumnRenamed(VID, DST), DST, "left_semi")
    )
    if unrenumber:
        out = graph.unrenumber(out, SRC)
        out = graph.unrenumber(out, DST)
    return out


def batched_ego_graphs(
    graph: LinkGraph, seeds, radius: int = 1, unrenumber: bool = True
) -> DataFrame:
    """DF[seed, src, dst, weight] — the ``radius``-hop egonet around every
    seed, all seeds in ONE batched frontier keyed by seed (reference
    ``community/egonet.py:155-238`` returns a concatenated edge list +
    seed offsets; the tidy ``seed`` column is the same information).

    Unlike a loop of :func:`ego_graph` calls (O(seeds) Spark jobs), the
    state here is [seed, v] and each hop is a single join+distinct, so the
    whole batch costs O(radius) jobs regardless of seed count.
    """
    spark = graph.spark
    if isinstance(seeds, DataFrame):
        s = seeds.select(F.col(seeds.columns[0]).alias("_ext"))
    else:
        s = spark.createDataFrame([(int(v),) for v in seeds], "_ext LONG")
    if graph.renumber_map is not None:
        m = graph.renumber_map.select(F.col("ext_id").alias("_ext"), VID)
        s = s.join(F.broadcast(m) if graph._map_small() else m, "_ext").select(
            F.col(VID).alias("seed")
        )
    else:
        s = s.select(F.col("_ext").cast("long").alias("seed"))

    e = graph.edges.select(SRC, DST)
    und = e.union(e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)))

    reached = truncate_state(s.select("seed", F.col("seed").alias("v")))
    frontier = reached
    for _ in range(radius):
        nxt = truncate_state(
            und.join(frontier.withColumnRenamed("v", SRC), SRC)
            .select("seed", F.col(DST).alias("v"))
            .distinct()
            .join(reached, ["seed", "v"], "left_anti")
        )
        if nxt.limit(1).count() == 0:
            nxt.unpersist()
            break
        old = reached
        reached = truncate_state(reached.union(nxt))
        old.unpersist()
        frontier = nxt

    out = (
        graph.edges.join(
            reached.select("seed", F.col("v").alias(SRC)), SRC, "inner"
        )
        .join(reached.select("seed", F.col("v").alias(DST)), ["seed", DST], "inner")
        .select("seed", SRC, DST, "weight")
    )
    if unrenumber:
        out = graph.unrenumber(out, SRC)
        out = graph.unrenumber(out, DST)
        out = graph.unrenumber(out, "seed")
    return out


def select_random_vertices(
    graph: LinkGraph, num_vertices: int, seed: int = 42, unrenumber: bool = True
) -> DataFrame:
    """DF[vertex] — uniform sample without replacement
    (``simpleGraph.py:767-803``). Seeded rand + global sort-limit on the
    (small) vertex id table."""
    out = (
        graph.vertices()
        .withColumn("_r", F.rand(seed))
        .orderBy("_r")
        .limit(num_vertices)
        .select(F.col(VID).alias("vertex"))
    )
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    return out


def uniform_neighbor_sample(
    graph: LinkGraph,
    start_list: DataFrame,
    fanout_vals: list,
    seed: int = 42,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[sources, destinations, hop_id] — per-hop uniform neighbor
    sampling with the given fanouts (``uniform_neighbor_sample.py:57-374``).
    Each hop: join frontier to edges, seeded-random row_number per source,
    keep ≤ fanout."""
    frontier = start_list.select(F.col(start_list.columns[0]).alias(VID))
    if graph.renumber_map is not None:
        m = graph.renumber_map.select(F.col("ext_id").alias(VID), F.col(VID).alias("_i"))
        frontier = frontier.join(
            F.broadcast(m) if graph._map_small() else m, VID
        ).select(F.col("_i").alias(VID))

    results = []
    for hop, fanout in enumerate(fanout_vals):
        cand = graph.edges.join(
            frontier.withColumnRenamed(VID, SRC), SRC
        ).select(SRC, DST)
        w = Window.partitionBy(SRC).orderBy(F.rand(seed + hop), DST)
        sampled = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= fanout)
            .select(
                F.col(SRC).alias("sources"),
                F.col(DST).alias("destinations"),
                F.lit(hop).alias("hop_id"),
            )
        )
        sampled = truncate_state(sampled)
        results.append(sampled)
        frontier = sampled.select(F.col("destinations").alias(VID)).distinct()

    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    if unrenumber:
        out = graph.unrenumber(out, "sources")
        out = graph.unrenumber(out, "destinations")
    return out
