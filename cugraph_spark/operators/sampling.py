"""Sampling — uniform random walks and node2vec-style biased walks.

Reference parity:
- ``random_walks(G, start_vertices, max_depth)``:
  ``python/cugraph/cugraph/sampling/random_walks.py:36-275`` — returns
  per-walk vertex paths; ours is ``DF[walk_id, step, vertex]`` (tidy form
  of the reference's flattened ``vertex_paths`` + ``path_sizes``).
- ``node2vec(G, start_vertices, max_depth, p, q)``:
  ``python/cugraph/cugraph/sampling/node2vec.py:23-141`` — 2nd-order
  biased walks; bias weights 1/p (return), 1 (distance-1), 1/q
  (distance-2) applied to the transition distribution.

Plan per step: the walker frontier (one row per active walk) joins the
persisted src-partitioned edge table; the next hop is chosen with a seeded
``rand()`` ranking per walk — the SURVEY §2.1 mapping of
``per_v_random_select_transform_outgoing_e``. Walks that hit a sink stop
(matching the reference's variable path_sizes). node2vec additionally
joins candidate hops against the previous vertex's edge set to classify
return/common/far candidates before weighting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..graph import DST, SRC, VID, WGT, LinkGraph, assign_dense_ids, truncate_state


def _starts(graph: LinkGraph, start_vertices: DataFrame) -> DataFrame:
    """[walk_id, vertex(internal)] from a 1-column external-id frame.

    walk_id = rank of the start vertex under a total order, assigned with
    ``assign_dense_ids`` (range-partitioned prefix sums) — a global
    no-partition window here would serialize every walk start through one
    task (VERDICT r01 #3/#4)."""
    col = start_vertices.columns[0]
    s = start_vertices.select(F.col(col).alias("_ext"))
    if graph.renumber_map is not None:
        m = graph.renumber_map.select(F.col("ext_id").alias("_ext"), VID)
        s = s.join(F.broadcast(m) if graph._map_small() else m, "_ext").select(
            F.col(VID).alias("v")
        )
    else:
        s = s.select(F.col("_ext").cast("long").alias("v"))
    return assign_dense_ids(s, ["v"], "walk_id")


def random_walks(
    graph: LinkGraph,
    start_vertices: DataFrame,
    max_depth: int,
    seed: int = 42,
    unrenumber: bool = True,
    random_walks_type: str = "uniform",
    p: float = 1.0,
    q: float = 1.0,
    deterministic: bool = False,
    rank_modulus: int | None = None,
) -> DataFrame:
    """DF[walk_id, step, vertex] — random walks of ≤ max_depth vertices per
    walk (stops early at sinks).

    ``random_walks_type`` mirrors the reference dispatch
    (``sampling/random_walks.py:49-56`` takes ``random_walks_type``
    ∈ {'uniform', 'biased', 'node2vec'}): 'uniform' draws the next hop
    uniformly over out-neighbors; 'biased' draws proportional to edge
    weight (requires a weighted graph); 'node2vec' delegates to
    :func:`node2vec` with the given ``p``/``q``.

    ``deterministic=True`` (uniform only) replaces the seeded ``rand()``
    selection with the per-step affine modular permutation of the neighbor
    id that batched GNN sampling uses (gnn.py ``rank_constants``): the
    walk becomes a pure function of ``(edges, starts, max_depth, seed)``,
    independent of partitioning and exactly reproducible in ANSI SQL —
    the property the driver oracle needs. ``rank_modulus`` optionally
    fixes the permutation modulus to a known id-space bound, skipping the
    max-id sizing job.
    """
    if random_walks_type not in ("uniform", "biased", "node2vec"):
        raise ValueError(
            f"random_walks_type must be 'uniform', 'biased', or 'node2vec'; "
            f"got {random_walks_type!r}"
        )
    # reject silently-ignored parameter combos (ADVICE r4): a caller who
    # asked for a deterministic walk must not be handed a nondeterministic
    # one, and p/q only mean something to node2vec
    if random_walks_type != "uniform" and (deterministic or rank_modulus is not None):
        raise ValueError(
            "deterministic/rank_modulus are only supported for "
            f"random_walks_type='uniform' (got {random_walks_type!r})"
        )
    if random_walks_type != "node2vec" and (p != 1.0 or q != 1.0):
        raise ValueError(
            "p/q only apply to random_walks_type='node2vec' "
            f"(got {random_walks_type!r} with p={p}, q={q})"
        )
    if random_walks_type == "node2vec":
        return node2vec(
            graph, start_vertices, max_depth, p=p, q=q, seed=seed,
            unrenumber=unrenumber,
        )
    if random_walks_type == "biased":
        return biased_random_walks(
            graph, start_vertices, max_depth, seed=seed, unrenumber=unrenumber
        )
    mod_p = None
    if deterministic:
        from ..gnn import _rank_expr  # lazy: avoids a package import cycle
        from .ecg import _next_prime_above

        if rank_modulus is not None:
            mod_p = _next_prime_above(int(rank_modulus))
        else:
            row = graph.edges.agg(
                F.greatest(F.max(SRC), F.max(DST)).alias("m")
            ).collect()[0]
            # edgeless graph → NULL max: any modulus works, every walk stops
            # at its start vertex (the step-1 frontier is empty)
            mod_p = _next_prime_above(int(row[0]) + 1) if row[0] is not None else 2

    starts = _starts(graph, start_vertices)
    frontier = starts.select("walk_id", F.col("v").alias("cur"))
    paths = [frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex"))]

    edges = graph.edges.select(SRC, DST)
    for step in range(1, max_depth):
        cand = edges.join(
            frontier.withColumnRenamed("cur", SRC), SRC
        ).select("walk_id", F.col(DST).alias("nxt"))
        key = (
            _rank_expr(F.col("nxt"), step, seed, mod_p)
            if deterministic
            else F.rand(seed + step)
        )
        w = Window.partitionBy("walk_id").orderBy(key, "nxt")
        frontier = truncate_state(
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("walk_id", F.col("nxt").alias("cur"))
        )
        if frontier.limit(1).count() == 0:
            break
        paths.append(
            frontier.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias("vertex"))
        )

    out = paths[0]
    for p in paths[1:]:
        out = out.union(p)
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    return out


def biased_random_walks(
    graph: LinkGraph,
    start_vertices: DataFrame,
    max_depth: int,
    seed: int = 42,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[walk_id, step, vertex] — first-order walks where the next hop is
    drawn with probability proportional to edge weight
    (``random_walks_type='biased'``, reference
    ``sampling/random_walks.py:75-78``; requires a weighted graph, as the
    reference's PLC call does).

    Same superstep plan as the uniform walk — one edge join + one per-walk
    argmin per step — with the selection key the weighted exponential race
    ``-log(u)/w`` (argmin is a draw ∝ w; the same trick node2vec below and
    the SURVEY §2.1 random-select prim use), so the biased draw costs no
    extra shuffle over uniform.
    """
    if not graph.properties.weighted:
        # the internal frame always carries an implicit weight-1.0 column
        # (graph.py:332-334), under which "biased" degenerates to uniform —
        # reject like the reference's PLC biased sampler does
        raise ValueError("biased random walks require a weighted graph")
    # the exponential race -log(u)/w is only a draw ∝ w for w > 0: a
    # negative weight flips the key sign and that edge ALWAYS wins the
    # argmin; a zero weight nulls the key.  Reject non-positive (and null)
    # weights up front, mirroring the reference PLC biased sampler's
    # positive-weight requirement (ADVICE r4).
    bad = graph.edges.filter(
        F.col(WGT).isNull() | (F.col(WGT) <= 0)
    ).limit(1)
    if bad.count() > 0:
        raise ValueError(
            "biased random walks require strictly positive edge weights "
            "(found a null or non-positive weight)"
        )
    starts = _starts(graph, start_vertices)
    frontier = starts.select("walk_id", F.col("v").alias("cur"))
    paths = [frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex"))]

    edges = graph.edges.select(SRC, DST, WGT)
    for step in range(1, max_depth):
        cand = edges.join(
            frontier.withColumnRenamed("cur", SRC), SRC
        ).select("walk_id", F.col(DST).alias("nxt"), F.col(WGT).alias("_w"))
        key = -F.log(F.rand(seed + step)) / F.col("_w")
        w = Window.partitionBy("walk_id").orderBy(key.asc(), F.col("nxt"))
        frontier = truncate_state(
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("walk_id", F.col("nxt").alias("cur"))
        )
        if frontier.limit(1).count() == 0:
            break
        paths.append(
            frontier.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias("vertex"))
        )

    out = paths[0]
    for pth in paths[1:]:
        out = out.union(pth)
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    return out


def node2vec(
    graph: LinkGraph,
    start_vertices: DataFrame,
    max_depth: int,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[walk_id, step, vertex] — node2vec biased walks: candidate next
    hops are weighted 1/p if returning to the previous vertex, 1 if the
    candidate neighbors the previous vertex, 1/q otherwise; selection is a
    weighted draw via the exponential-race trick
    (``-log(u)/w`` minimization, deterministic under the seed)."""
    starts = _starts(graph, start_vertices)
    edges = graph.edges.select(SRC, DST)

    # step 1 is uniform (no previous vertex yet)
    frontier = starts.select("walk_id", F.col("v").alias("cur"), F.lit(None).cast("long").alias("prev"))
    paths = [frontier.select("walk_id", F.lit(0).alias("step"), F.col("cur").alias("vertex"))]

    # adjacency pairs for the "does candidate neighbor prev" test
    adj = edges.select(F.col(SRC).alias("prev"), F.col(DST).alias("nxt")).withColumn(
        "_is_nbr", F.lit(True)
    )

    for step in range(1, max_depth):
        cand = edges.join(frontier.withColumnRenamed("cur", SRC), SRC).select(
            "walk_id", F.col(SRC).alias("cur"), F.col(DST).alias("nxt"), "prev"
        )
        cand = cand.join(adj, ["prev", "nxt"], "left")
        weight = (
            F.when(F.col("nxt") == F.col("prev"), F.lit(1.0 / p))
            .when(F.col("_is_nbr"), F.lit(1.0))
            .otherwise(F.lit(1.0 / q))
        )
        # weighted reservoir: pick argmin of -log(u)/w per walk
        key = -F.log(F.rand(seed + step)) / weight
        w = Window.partitionBy("walk_id").orderBy(key.asc(), F.col("nxt"))
        frontier = truncate_state(
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("walk_id", F.col("nxt").alias("cur"), F.col("cur").alias("prev"))
        )
        if frontier.limit(1).count() == 0:
            break
        paths.append(
            frontier.select("walk_id", F.lit(step).alias("step"), F.col("cur").alias("vertex"))
        )

    out = paths[0]
    for pth in paths[1:]:
        out = out.union(pth)
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    return out


def rw_path(num_paths: int, sizes: DataFrame) -> DataFrame:
    """Per-path offset bookkeeping for un-padded random-walk output.

    Reference parity: ``sampling/random_walks.py:232-275`` (``rw_path``) —
    given path sizes in walk order, returns one row per path:

    - ``vertex_offsets``  — exclusive prefix sum of ``size``
    - ``weight_sizes``    — ``size - 1`` (edges per path)
    - ``weight_offsets``  — exclusive prefix sum of ``size - 1``

    ``sizes`` is a DataFrame with columns ``(walk_id, size)``, or the tidy
    ``random_walks`` output ``(walk_id, step, vertex)`` from which sizes are
    derived. Output adds ``walk_id`` so rows stay addressable after a shuffle
    (the reference relies on positional indexing, meaningless in a
    distributed frame).

    Scale note: a global running sum is NOT computed with an unpartitioned
    window (that collapses to one task). Two-phase scan instead: per-range
    partial sums are aggregated (tiny — one row per partition), broadcast
    back as base offsets, and the running sum completes per-partition.
    """
    cols = set(sizes.columns)
    if "size" not in cols:
        if not {"walk_id", "step"} <= cols:
            raise ValueError("sizes needs (walk_id, size) or (walk_id, step, vertex)")
        sizes = sizes.groupBy("walk_id").agg(F.count("*").alias("size"))
    df = sizes.select("walk_id", F.col("size").cast("long").alias("size"))
    # Pin the range partitioning: both branches below (partial sums + final
    # scan) must observe the SAME _pid assignment, and range-sampled bounds
    # are not stable across lineage re-execution.
    df = truncate_state(
        df.repartitionByRange("walk_id").withColumn("_pid", F.spark_partition_id())
    )

    part_tot = df.groupBy("_pid").agg(
        F.sum("size").alias("_pv"),
        F.sum(F.col("size") - 1).alias("_pw"),
        F.min("walk_id").alias("_lo"),
    )
    wp = (
        Window.orderBy("_lo")  # one row per partition: tiny, driver-safe
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = part_tot.select(
        "_pid",
        F.coalesce(F.sum("_pv").over(wp), F.lit(0)).alias("_bv"),
        F.coalesce(F.sum("_pw").over(wp), F.lit(0)).alias("_bw"),
    )
    win = Window.partitionBy("_pid").orderBy("walk_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = (
        df.withColumn("_cv", F.coalesce(F.sum("size").over(win), F.lit(0)))
        .withColumn("_cw", F.coalesce(F.sum(F.col("size") - 1).over(win), F.lit(0)))
        .join(F.broadcast(base), "_pid")
        .select(
            "walk_id",
            (F.col("_bv") + F.col("_cv")).alias("vertex_offsets"),
            (F.col("size") - 1).alias("weight_sizes"),
            (F.col("_bw") + F.col("_cw")).alias("weight_offsets"),
        )
    )
    return out.orderBy("walk_id").limit(int(num_paths))
