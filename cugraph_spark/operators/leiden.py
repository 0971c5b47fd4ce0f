"""Leiden community detection — Louvain local moving + a refinement phase
that splits badly-connected communities before coarsening.

Reference parity: ``python/cugraph/cugraph/community/leiden.py:33-129``
(``leiden(G, max_iter, resolution) → (DF[vertex, partition],
modularity)``); tests ``tests/community/test_leiden.py`` assert Leiden
modularity ≥ Louvain's.  C++ kernel ``cpp/src/community/leiden_impl.cuh``.

Structure per level (Traag et al. 2019, distributed variant):
1. LOCAL MOVE — identical to Louvain (``louvain._local_move``): maximize
   modularity gain, deterministic smallest-id tie-break.
2. REFINE — inside each community from step 1, restart from singletons and
   run the SAME local-moving procedure restricted to the subgraph of
   intra-community edges.  A community whose internal connectivity is poor
   splits into well-connected pieces; Louvain would aggregate it as one
   block and lock the defect in (the pathology Leiden exists to fix).
3. COARSEN on the REFINED partition, but seed the next level's communities
   with the step-1 (coarse) assignment — refined pieces of one community
   start together and may be re-merged or re-split at the next level.

Every phase is the Louvain join/groupBy superstep; refinement reuses
``_local_move`` verbatim on a filtered edge frame, so the whole operator
adds no new physical plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..graph import VID, LinkGraph, truncate_state
from .louvain import _canonical_undirected, _levels, _local_move, _modularity


def leiden(
    graph: LinkGraph,
    max_iter: int = 20,
    max_levels: int = 10,
    resolution: float = 1.0,
    unrenumber: bool = True,
):
    """Returns ``(DF[vertex, partition], modularity)``; partition labels
    canonicalized to each community's minimum member id."""
    n_part = graph.num_partitions

    edges = truncate_state(_canonical_undirected(graph), n_part, "a")
    mapping = None  # original vertex -> current-level vertex (refined id)
    seed_comm = None  # next level's initial assignment [i, c] (refined -> coarse)
    final_comm = None  # last level's coarse assignment [i, c]

    for _level in range(max_levels):
        loops = edges.filter(F.col("a") == F.col("b"))
        nonloops = edges.filter(F.col("a") != F.col("b"))
        both = nonloops.select(
            F.col("a").alias("i"), F.col("b").alias("j"), "w"
        ).union(nonloops.select(F.col("b").alias("i"), F.col("a").alias("j"), "w"))
        deg = (
            both.groupBy("i").agg(F.sum("w").alias("k"))
            .join(
                loops.select(F.col("a").alias("i"), (F.lit(2.0) * F.col("w")).alias("lw")),
                "i",
                "full",
            )
            .select(
                "i",
                (F.coalesce("k", F.lit(0.0)) + F.coalesce("lw", F.lit(0.0))).alias("k"),
            )
        )
        two_m = deg.agg(F.sum("k")).collect()[0][0] or 0.0
        if two_m == 0:
            break
        deg = truncate_state(deg, n_part, "i")
        n_before = deg.count()

        # ---- 1. local move (seeded with the previous level's coarse
        # assignment — Leiden carries the partition down, Louvain restarts)
        if seed_comm is None:
            comm0 = deg.select("i", F.col("i").alias("c"))
        else:
            comm0 = deg.join(seed_comm, "i", "left").select(
                "i", F.coalesce("c", F.col("i")).alias("c")
            )
        comm0 = truncate_state(comm0, n_part, "i")
        comm = _local_move(both, deg, comm0, two_m, resolution, n_part, max_iter)

        # ---- 2. refinement: singleton restart on intra-community edges
        ci = comm.select(F.col("i"), F.col("c").alias("_ci"))
        cj = comm.select(F.col("i").alias("j"), F.col("c").alias("_cj"))
        intra = (
            both.join(ci, "i")
            .join(cj, "j")
            .filter(F.col("_ci") == F.col("_cj"))
            .select("i", "j", "w")
        )
        ref0 = truncate_state(deg.select("i", F.col("i").alias("c")), n_part, "i")
        refined = _local_move(intra, deg, ref0, two_m, resolution, n_part, max_iter)

        # canonicalize refined labels to each piece's min member id so they
        # are valid vertex ids of the coarsened graph
        rcanon = refined.groupBy("c").agg(F.min("i").alias("_rc"))
        refined = truncate_state(
            refined.join(rcanon, "c").select("i", F.col("_rc").alias("r")), n_part, "i"
        )

        n_refined = refined.select("r").distinct().count()

        # compose mapping original -> refined supervertex
        old_mapping = mapping
        if mapping is None:
            mapping = refined.select(F.col("i").alias("orig"), F.col("r").alias("cur"))
        else:
            mapping = mapping.join(
                refined.select(F.col("i").alias("cur"), F.col("r").alias("_nc")), "cur"
            ).select("orig", F.col("_nc").alias("cur"))
        mapping = truncate_state(mapping, n_part, "orig")
        if old_mapping is not None:
            old_mapping.unpersist()

        # coarse community of each refined supervertex — the final
        # assignment if this is the last level, and the next level's seed
        r2c = (
            refined.join(comm, "i")
            .groupBy("r")
            .agg(F.min("c").alias("c"))  # one coarse c per refined piece
        )
        if final_comm is not None:
            final_comm.unpersist()
        final_comm = truncate_state(
            r2c.select(F.col("r").alias("i"), "c"), n_part, "i"
        )

        if n_refined >= n_before:
            deg.unpersist()
            comm.unpersist()
            refined.unpersist()
            break

        # ---- 3. coarsen by refined partition
        rm = refined.select(F.col("i").alias("a"), F.col("r").alias("ra"))
        rm2 = refined.select(F.col("i").alias("b"), F.col("r").alias("rb"))
        new_edges = (
            edges.join(rm, "a")
            .join(rm2, "b")
            .select(
                F.least("ra", "rb").alias("a"),
                F.greatest("ra", "rb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
        )
        old_edges = edges
        edges = truncate_state(new_edges, n_part, "a")
        old_edges.unpersist()
        if seed_comm is not None:
            seed_comm.unpersist()
        seed_comm = final_comm  # [refined_id, coarse_c] seeds the next level
        final_comm = None
        deg.unpersist()
        comm.unpersist()
        refined.unpersist()

    edges.unpersist()
    if mapping is None:  # empty/edgeless graph
        mapping = graph.vertices().select(
            F.col(VID).alias("orig"), F.col(VID).alias("cur")
        )
        final_comm = None

    # final partition: orig -> cur (refined) -> coarse community
    if final_comm is not None:
        m_orig = mapping.join(
            final_comm.select(F.col("i").alias("cur"), "c"), "cur", "left"
        ).select(
            F.col("orig").alias("v"), F.coalesce("c", F.col("cur")).alias("c")
        )
    elif seed_comm is not None:
        m_orig = mapping.join(
            seed_comm.select(F.col("i").alias("cur"), "c"), "cur", "left"
        ).select(
            F.col("orig").alias("v"), F.coalesce("c", F.col("cur")).alias("c")
        )
    else:
        m_orig = mapping.select(F.col("orig").alias("v"), F.col("cur").alias("c"))

    orig = truncate_state(_canonical_undirected(graph), n_part, "a")

    # ---- 4. compound-move polish -----------------------------------------
    # Piece-level local moving cannot execute a whole-community merge:
    # moving one refined piece alone can be negative-gain even when moving
    # its entire community is positive, so the refined levels can strand Q
    # at the level-0 local optimum (observed on karate: stuck at 0.3991
    # while Louvain's community-aggregated levels reach 0.4198).  Coarsen
    # the ORIGINAL graph by the final partition (one supervertex per
    # community, self-loops carrying intra weight) and run the Louvain
    # level loop over it — every supervertex move IS a whole-community
    # merge.  Leiden's level 0 equals Louvain's level 0 (same deterministic
    # local move), so with this phase the reference contract
    # ``Q(leiden) >= Q(louvain)`` (tests/community/test_leiden.py) holds;
    # the better of (polished, unpolished) is returned as a final guard
    # against synchronous-move regressions.  Cost: C-row levels + one extra
    # E-row coarsen/modularity pass.
    m_orig = truncate_state(m_orig, n_part, "v")
    cm = m_orig.select(F.col("v").alias("a"), F.col("c").alias("ca"))
    cm2 = m_orig.select(F.col("v").alias("b"), F.col("c").alias("cb"))
    agg_edges = (
        orig.join(cm, "a")
        .join(cm2, "b")
        .select(
            F.least("ca", "cb").alias("a"),
            F.greatest("ca", "cb").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )
    polish = _levels(
        truncate_state(agg_edges, n_part, "a"),
        n_part,
        resolution,
        max_iter,
        max_levels,
    )
    modularity = _modularity(orig, m_orig, resolution)
    if polish is not None:
        m_pol = truncate_state(
            m_orig.join(
                polish.select(F.col("orig").alias("c"), F.col("cur").alias("_pc")),
                "c",
                "left",
            ).select("v", F.coalesce("_pc", F.col("c")).alias("c")),
            n_part,
            "v",
        )
        q_pol = _modularity(orig, m_pol, resolution)
        polish.unpersist()
        if q_pol > modularity:
            m_orig.unpersist()
            m_orig, modularity = m_pol, q_pol
        else:
            m_pol.unpersist()

    out = m_orig.select(F.col("v").alias("vertex"), F.col("c").alias("partition"))
    canon = out.groupBy("partition").agg(F.min("vertex").alias("_canon"))
    out = out.join(canon, "partition").select(
        "vertex", F.col("_canon").alias("partition")
    )
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
        if graph.renumber_map is not None:
            canon2 = out.groupBy("partition").agg(F.min("vertex").alias("_c2"))
            out = out.join(canon2, "partition").select(
                "vertex", F.col("_c2").alias("partition")
            )
    orig.unpersist()
    if mapping.is_cached:
        mapping.unpersist()
    return out, float(modularity)
