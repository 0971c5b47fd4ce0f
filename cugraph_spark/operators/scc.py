"""Strongly connected components — distributed coloring algorithm.

Reference parity: ``components/connectivity.py:209-340``
(``strongly_connected_components`` → DF[vertex, labels]); the reference's
kernel is a legacy single-GPU adjacency-matrix path
(``cpp/src/components/legacy/scc_matrix.cuh``), which does not translate
to a scale-out setting — we use the standard coloring/FW-BW scheme
(Orzan-style) instead, which is join/groupBy-shaped:

repeat until no vertices remain:
  1. TRIM: peel vertices with zero in- or out-degree in the remaining
     subgraph (each is a singleton SCC).
  2. COLOR: propagate ``color(v) = max(v, max over in-neighbors)`` to
     fixpoint (forward reachability from each color root).
  3. MARK: from every color root r (where color(r) == r), walk REVERSE
     edges restricted to same-colored vertices; the marked set is exactly
     the SCC of r. Assign label = root, remove those vertices, repeat.

Every step is the same edges⋈state → groupBy → merge superstep as WCC,
with per-round state truncation; outer rounds are few in practice (each
round removes at least one SCC per color class).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exceptions import FailedToConvergeError
from ..graph import DST, SRC, VID, LinkGraph, truncate_state


def strongly_connected_components(
    graph: LinkGraph,
    max_outer: int = 50,
    max_inner: int = 200,
    unrenumber: bool = True,
    fail_on_nonconvergence: bool = False,
) -> DataFrame:
    """DF[vertex, labels] — label = component's minimum-reachable root id
    class representative (stable across runs; component PARTITION equality
    is the contract, as in the reference's tests)."""
    n_part = graph.num_partitions

    edges = truncate_state(
        graph.edges.select(SRC, DST).distinct(), n_part, SRC
    )
    verts = truncate_state(
        graph.vertices().select(F.col(VID).alias("v")), n_part, "v"
    )
    assigned = None  # accumulated [v, labels]

    for _ in range(max_outer):
        if verts.limit(1).count() == 0:
            break

        # ---- 1. trim singleton SCCs (no in- or no out-edge remaining)
        while True:
            srcs = edges.select(F.col(SRC).alias("v")).distinct()
            dsts = edges.select(F.col(DST).alias("v")).distinct()
            keep = srcs.join(dsts, "v")  # has both in- and out-edges
            trimmed = verts.join(keep, "v", "left_anti")
            trimmed = truncate_state(trimmed, n_part, "v")
            if trimmed.limit(1).count() == 0:
                trimmed.unpersist()
                break
            singletons = trimmed.select("v", F.col("v").alias("labels"))
            assigned = (
                singletons
                if assigned is None
                else assigned.union(singletons)
            )
            assigned = truncate_state(assigned, n_part, "v")
            old_v, old_e = verts, edges
            verts = truncate_state(verts.join(trimmed, "v", "left_anti"), n_part, "v")
            edges = truncate_state(
                edges.join(trimmed.withColumnRenamed("v", SRC), SRC, "left_anti")
                .join(trimmed.withColumnRenamed("v", DST), DST, "left_anti"),
                n_part,
                SRC,
            )
            old_v.unpersist()
            old_e.unpersist()
            trimmed.unpersist()

        if verts.limit(1).count() == 0:
            break

        # ---- 2. forward max-color propagation to fixpoint
        colors = truncate_state(verts.select("v", F.col("v").alias("c")), n_part, "v")
        for _ in range(max_inner):
            pushed = (
                edges.join(colors.select(F.col("v").alias(SRC), "c"), SRC)
                .groupBy(F.col(DST).alias("v"))
                .agg(F.max("c").alias("nc"))
            )
            new_colors = (
                colors.join(pushed.hint("shuffle_hash"), "v", "left")
                .select("v", F.greatest(F.col("c"), F.coalesce("nc", "c")).alias("c"))
            )
            new_colors = truncate_state(new_colors, n_part, "v")
            changed = (
                new_colors.join(colors.withColumnRenamed("c", "oc"), "v")
                .filter(F.col("c") != F.col("oc"))
                .limit(1)
                .count()
            )
            colors.unpersist()
            colors = new_colors
            if changed == 0:
                break

        # ---- 3. backward mark within color from each root
        roots = colors.filter(F.col("v") == F.col("c")).select("v", "c")
        marked = truncate_state(roots, n_part, "v")
        rev = edges.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
        for _ in range(max_inner):
            step = (
                rev.join(marked.select(F.col("v").alias(SRC), "c"), SRC)
                .select(F.col(DST).alias("v"), "c")
                .distinct()
                .join(colors.withColumnRenamed("c", "vc"), "v")
                .filter(F.col("c") == F.col("vc"))  # stay inside the color
                .select("v", "c")
                .join(marked.select("v"), "v", "left_anti")
            )
            step = truncate_state(step, n_part, "v")
            if step.limit(1).count() == 0:
                step.unpersist()
                break
            marked = truncate_state(marked.union(step), n_part, "v")

        scc = marked.select("v", F.col("c").alias("labels"))
        assigned = scc if assigned is None else assigned.union(scc)
        assigned = truncate_state(assigned, n_part, "v")

        old_v, old_e = verts, edges
        verts = truncate_state(verts.join(marked.select("v"), "v", "left_anti"), n_part, "v")
        edges = truncate_state(
            edges.join(marked.select(F.col("v").alias(SRC)), SRC, "left_anti")
            .join(marked.select(F.col("v").alias(DST)), DST, "left_anti"),
            n_part,
            SRC,
        )
        old_v.unpersist()
        old_e.unpersist()
        colors.unpersist()
        marked.unpersist()
    else:
        # max_outer exhausted: any still-unassigned vertex must not be
        # silently dropped — label each with itself (correct whenever the
        # residual has only singleton SCCs; WRONG if a multi-vertex SCC
        # remains, so the caller gets an explicit signal, mirroring
        # pagerank's nonconvergence contract)
        n_left = verts.count()
        if n_left > 0:
            msg = (
                f"strongly_connected_components: max_outer={max_outer} "
                f"exhausted with {n_left} unassigned vertices; labeling them "
                "as singleton SCCs, which is wrong if the residual contains "
                "a multi-vertex SCC. Raise max_outer."
            )
            if fail_on_nonconvergence:
                raise FailedToConvergeError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        leftover = verts.select("v", F.col("v").alias("labels"))
        assigned = leftover if assigned is None else assigned.union(leftover)

    if assigned is None:
        # zero-vertex graph: empty [vertex, labels] frame, not an error
        assigned = graph.spark.createDataFrame([], "v LONG, labels LONG")

    out = assigned.select(F.col("v").alias("vertex"), "labels")
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
        if graph.renumber_map is not None:
            comp_min = out.groupBy("labels").agg(F.min("vertex").alias("_canon"))
            out = out.join(comp_min, "labels").select(
                "vertex", F.col("_canon").alias("labels")
            )
    return out
