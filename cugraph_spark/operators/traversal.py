"""Traversal — BFS and SSSP as frontier-join loops.

Reference parity:
- BFS: ``python/cugraph/cugraph/traversal/bfs.py:119-255`` — returns
  ``DF[vertex, distance, predecessor]``; C++ is direction-optimizing
  (``bfs_impl.cuh:96-125``) which is a physical optimization we skip
  (SURVEY §4 "skip — optimization, not semantics").
- SSSP: ``python/cugraph/cugraph/traversal/sssp.py:128-263`` — returns
  ``DF[vertex, distance, predecessor]``; C++ uses near/far delta buckets
  (``sssp_impl.cuh:139-180``); we use a Bellman-Ford-style relax loop —
  same fixpoint, simpler plan, and each round is one shuffle join + one
  groupBy-min, which is what survives at cluster scale.

Scale notes: the frontier is a small DataFrame (usually ≪ V rows) that
broadcasts against the persisted, src-partitioned edge table — the big side
never moves. Distances state is V rows, localCheckpoint-ed per round to cut
lineage. Predecessor tie-break is ``min(predecessor)`` so results are
deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, VID, WGT, LinkGraph, truncate_state


def _internal_source(graph: LinkGraph, source) -> int:
    """Map an external source vertex to its internal id."""
    if graph.renumber_map is None:
        return int(source)
    row = graph.renumber_map.filter(F.col("ext_id") == source).select(VID).collect()
    if not row:
        raise ValueError(f"bfs/sssp: source vertex {source!r} not in graph")
    return int(row[0][0])


def bfs(
    graph: LinkGraph,
    start,
    depth_limit: int | None = None,
    unrenumber: bool = True,
) -> DataFrame:
    """Breadth-first search → DF[vertex, distance, predecessor].

    Unreached vertices are omitted (callers can left-join against
    ``graph.vertices()`` and fill with the reference's sentinel if needed).
    Predecessor of the start vertex is -1, matching the reference convention.
    """
    n_part = graph.num_partitions
    s = _internal_source(graph, start)
    edges = graph.edges.select(SRC, DST)

    # state: [id, distance, pred]; frontier: vertices discovered last round
    state = truncate_state(
        graph.spark.createDataFrame(
            [(s, 0, -1)], f"{VID} LONG, distance INT, pred LONG"
        ),
        n_part,
        VID,
    )
    frontier = state.select(VID)

    depth = 0
    limit = depth_limit if depth_limit is not None else 2**31 - 1
    while depth < limit:
        # expand: neighbors of the frontier not yet visited; pred = min(src)
        cand = (
            edges.join(frontier.withColumnRenamed(VID, SRC), SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg(F.min(SRC).alias("pred"))
        )
        new = (
            cand.join(state.select(VID, F.lit(True).alias("_seen")), VID, "left")
            .filter(F.col("_seen").isNull())
            .select(VID, F.lit(depth + 1).alias("distance"), "pred")
        )
        new = truncate_state(new, n_part, VID)
        n_new = new.count()
        if n_new == 0:
            new.unpersist()
            break
        old_state = state
        state = truncate_state(
            state.union(new.select(VID, "distance", "pred")), n_part, VID
        )
        old_state.unpersist()
        frontier = new.select(VID)
        depth += 1

    out = state.select(
        F.col(VID).alias("vertex"), "distance", F.col("pred").alias("predecessor")
    )
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
        if graph.renumber_map is not None:
            # predecessor is also a vertex id; -1 stays -1
            m = graph.renumber_map.select(
                F.col(VID).alias("predecessor"), F.col("ext_id").alias("_p")
            )
            out = (
                out.join(
                    F.broadcast(m) if graph._map_small() else m,
                    "predecessor",
                    "left",
                )
                .select(
                    "vertex",
                    "distance",
                    F.coalesce(F.col("_p"), F.lit(-1)).alias("predecessor"),
                )
            )
    return out


def sssp(
    graph: LinkGraph,
    source,
    max_iter: int = 500,
    unrenumber: bool = True,
) -> DataFrame:
    """Single-source shortest paths (non-negative weights) →
    DF[vertex, distance, predecessor]. Bellman-Ford frontier relaxation:
    only vertices whose distance improved last round re-relax their
    out-edges, so each round is frontier ⋈ edges → groupBy(dst).min."""
    n_part = graph.num_partitions
    s = _internal_source(graph, source)
    edges = graph.edges.select(SRC, DST, WGT)

    dist = truncate_state(
        graph.spark.createDataFrame(
            [(s, 0.0, -1)], f"{VID} LONG, distance DOUBLE, pred LONG"
        ),
        n_part,
        VID,
    )
    frontier = dist

    for _ in range(max_iter):
        relax = (
            edges.join(
                frontier.select(F.col(VID).alias(SRC), F.col("distance").alias("_d")),
                SRC,
            )
            .select(
                F.col(DST).alias(VID),
                (F.col("_d") + F.col(WGT)).alias("nd"),
                F.col(SRC).alias("npred"),
            )
            # deterministic argmin: smallest distance, then smallest pred
            .groupBy(VID)
            .agg(
                F.min(F.struct(F.col("nd"), F.col("npred"))).alias("best"),
            )
            .select(VID, F.col("best.nd").alias("nd"), F.col("best.npred").alias("npred"))
        )
        merged = (
            dist.join(relax, VID, "full")
            .select(
                F.col(VID),
                F.col("distance"),
                F.col("pred"),
                F.col("nd"),
                F.col("npred"),
            )
        )
        improved = merged.filter(
            F.col("distance").isNull() | (F.col("nd") < F.col("distance"))
        ).select(VID, F.col("nd").alias("distance"), F.col("npred").alias("pred"))
        improved = truncate_state(improved, n_part, VID)
        if improved.count() == 0:
            improved.unpersist()
            break
        kept = (
            dist.join(improved.select(VID, F.lit(True).alias("_i")), VID, "left")
            .filter(F.col("_i").isNull())
            .select(VID, "distance", "pred")
        )
        old_dist = dist
        dist = truncate_state(kept.union(improved), n_part, VID)
        old_dist.unpersist()
        frontier = improved

    out = dist.select(
        F.col(VID).alias("vertex"), "distance", F.col("pred").alias("predecessor")
    )
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
        if graph.renumber_map is not None:
            m = graph.renumber_map.select(
                F.col(VID).alias("predecessor"), F.col("ext_id").alias("_p")
            )
            out = (
                out.join(
                    F.broadcast(m) if graph._map_small() else m,
                    "predecessor",
                    "left",
                )
                .select(
                    "vertex",
                    "distance",
                    F.coalesce(F.col("_p"), F.lit(-1)).alias("predecessor"),
                )
            )
    return out


def bfs_edges(
    graph: LinkGraph,
    source,
    reverse: bool = False,
    depth_limit: int | None = None,
    sort_neighbors=None,
) -> DataFrame:
    """NetworkX-compat BFS wrapper → DF[vertex, distance, predecessor].

    Reference parity: ``traversal/bfs.py:256-330`` (``bfs_edges``) — a thin
    delegate to ``bfs``; ``reverse=True`` and ``sort_neighbors`` raise
    NotImplementedError exactly as the reference does.
    """
    if reverse is True:
        raise NotImplementedError(
            "reverse processing of graph is currently not supported"
        )
    if sort_neighbors is not None:
        raise NotImplementedError("sort_neighbors is currently not supported")
    return bfs(graph, source, depth_limit=depth_limit)


def concurrent_bfs(graphs, sources, depth_limit=None, offload=False):
    """Unimplemented in the reference (``traversal/ms_bfs.py:108-160`` raises
    before any work); mirrored here so callers porting code get the same
    signal rather than a silent AttributeError."""
    raise NotImplementedError(
        "concurrent_bfs is not implemented (the reference raises too); "
        "run bfs() per (graph, source) — each call is already distributed"
    )


def multi_source_bfs(graph, sources, components=None, depth_limit=None, offload=False):
    """Unimplemented in the reference (``traversal/ms_bfs.py:183-243`` raises
    before any work); mirrored for signature parity."""
    raise NotImplementedError(
        "multi_source_bfs is not implemented (the reference raises too); "
        "run bfs() per source — each call is already distributed"
    )


# --------------------------------------------------------------- path helpers
# Reference: ``traversal/sssp.py:264-291`` (filter_unreachable),
# ``sssp.py:313-389`` (shortest_path_length),
# ``utilities/utils.py:69-211`` (get_traversed_path / _list).


def filter_unreachable(df: DataFrame) -> DataFrame:
    """Drop unreachable rows from a BFS/SSSP result (``sssp.py:264-291``).

    Our traversals omit unreached vertices, but callers that left-join the
    result against the full vertex set acquire sentinel rows — this removes
    rows whose distance is null, infinite, or the integer max sentinel.
    """
    if "distance" not in df.columns:
        raise KeyError("No distance column found in input data frame")
    dt = dict(df.dtypes)["distance"]
    c = F.col("distance")
    if dt in ("int", "bigint", "smallint", "tinyint"):
        max_val = {"tinyint": 127, "smallint": 32767, "int": 2**31 - 1, "bigint": 2**63 - 1}[dt]
        return df.filter(c.isNotNull() & (c != F.lit(max_val)))
    return df.filter(c.isNotNull() & ~F.isnan(c) & (c != F.lit(float("inf"))))


def shortest_path_length(graph: LinkGraph, source, target=None):
    """Distance from ``source`` to ``target`` (scalar) or to every
    reachable vertex (DF[vertex, distance]) — ``sssp.py:313-389``."""
    res = sssp(graph, source)
    if target is None:
        return res.select("vertex", "distance")
    row = res.filter(F.col("vertex") == target).select("distance").collect()
    if not row:
        raise ValueError(f"Graph has no path from {source!r} to {target!r}")
    return float(row[0][0])


def _validate_traversal_result(df: DataFrame) -> None:
    for col in ("vertex", "distance", "predecessor"):
        if col not in df.columns:
            raise ValueError(
                "DataFrame does not appear to be a BFS or SSSP result - "
                f"'{col}' column missing"
            )


def get_traversed_path(df: DataFrame, vertex_id) -> DataFrame:
    """Rows of the BFS/SSSP result along the path root→``vertex_id``
    (``utilities/utils.py:69-140``).  Driver-side predecessor walk — path
    length is at most the graph diameter, so the loop is small; each step
    is a point filter on the (small) traversal result."""
    _validate_traversal_result(df)
    rows = {r["vertex"]: r for r in df.collect()}
    if vertex_id not in rows:
        raise ValueError(f"The vertex {vertex_id!r} is not in the result set")
    path = []
    cur = vertex_id
    while True:
        path.append(rows[cur])
        pred = rows[cur]["predecessor"]
        if pred == -1 or pred is None or pred not in rows:
            break
        cur = pred
    return df.sparkSession.createDataFrame(path, df.schema)


def get_traversed_path_list(df: DataFrame, vertex_id) -> list:
    """Ordered vertex ids from ``vertex_id`` back to the root
    (``utilities/utils.py:143-211``)."""
    _validate_traversal_result(df)
    rows = {r["vertex"]: r["predecessor"] for r in df.collect()}
    if vertex_id not in rows:
        raise ValueError(f"The vertex {vertex_id!r} is not in the result set")
    answer = [vertex_id]
    pred = rows[vertex_id]
    while pred != -1 and pred is not None and pred in rows:
        answer.append(pred)
        pred = rows[pred]
    return answer
