"""PageRank — power iteration with damping, dangling-mass redistribution,
personalization, and L1 convergence.

Semantics follow the reference exactly
(``cpp/src/link_analysis/pagerank_impl.cuh``):
- init rank = 1/V (``:381-386``) or normalized ``nstart``,
- per iteration: dangling mass = Σ ranks of out-weight-0 vertices
  (``:238-247``); pre-divide rank by out-weight-sum (``:249-261``);
  constant term ``(α·dangling + (1-α))/V`` (``:265-268``);
  gather ``α·Σ_src rank'·w`` (``:270-296``);
  personalization replaces the constant with
  ``(α·dangling + (1-α))·(p_v/Σp)`` (``:298-318``);
- converge when L1 ``Σ|r - r_old| < tol`` (``:320-333``).
Python API parity: ``python/cugraph/cugraph/link_analysis/pagerank.py:83-308``.

Spark plan per superstep (SURVEY §4): contributions are pre-divided once so
the gather is a plain associative SUM; the big edge table is persisted
hash-partitioned by ``src`` at graph build and never re-shuffled — only the
V-row rank state moves (one shuffle for the join-by-src, one for the
groupBy-dst). Dangling mass and the L1 delta are scalar folds, never edge
traffic. Each iteration persists the new rank state (and optionally
checkpoints it with a lineage manifest) so plans do not grow unboundedly.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC, VID, WGT, LinkGraph, truncate_state


@dataclass
class PageRankResult:
    ranks: DataFrame  # [vertex, pagerank]
    converged: bool
    iterations: int
    l1_history: list


def pagerank(
    graph: LinkGraph,
    alpha: float = 0.85,
    personalization: DataFrame | None = None,
    max_iter: int = 100,
    tol: float = 1e-5,
    nstart: DataFrame | None = None,
    precomputed_vertex_out_weight: DataFrame | None = None,
    fail_on_nonconvergence: bool = True,
    checkpointer=None,
    unrenumber: bool = True,
) -> PageRankResult:
    """Compute PageRank; returns vertex-keyed DataFrame [vertex, pagerank].

    ``personalization``/``nstart``: DataFrames [vertex, values] keyed by
    *external* ids (renumbered internally, as in ``pagerank.py:33-40``).
    ``tol<=0`` forces exactly ``max_iter`` iterations (used by the fixed-
    iteration oracle-comparable variant).
    """
    spark = graph.spark
    n_part = graph.num_partitions
    V = graph.number_of_vertices()
    if V == 0:
        raise ValueError("pagerank: graph has no vertices")

    # ---- static vertex state: [id, out_wsum], partitioned by id -----------
    if precomputed_vertex_out_weight is not None:
        ows = _renumber_values(graph, precomputed_vertex_out_weight, "out_wsum")
        ows = (
            graph.vertices()
            .join(ows, VID, "left")
            .fillna(0.0, ["out_wsum"])
        )
    else:
        ows = graph.out_weight_sums()
    vstate = ows.repartition(n_part, VID).persist()
    vstate.count()

    # ---- personalization ---------------------------------------------------
    pers = None
    if personalization is not None:
        p = _renumber_values(graph, personalization, "p")
        psum = p.agg(F.sum("p")).collect()[0][0]
        pers = (
            graph.vertices()
            .join(p, VID, "left")
            .fillna(0.0, ["p"])
            .withColumn("p_norm", F.col("p") / F.lit(float(psum)))
            .select(VID, "p_norm")
            .repartition(n_part, VID)
            .persist()
        )
        pers.count()

    # ---- initial ranks ------------------------------------------------------
    if nstart is not None:
        r0 = _renumber_values(graph, nstart, "rank")
        rsum = r0.agg(F.sum("rank")).collect()[0][0]
        ranks = (
            graph.vertices()
            .join(r0, VID, "left")
            .fillna(0.0, ["rank"])
            .withColumn("rank", F.col("rank") / F.lit(float(rsum)))
            .select(VID, "rank")
        )
    else:
        ranks = graph.vertices().withColumn("rank", F.lit(1.0 / V))
    ranks = ranks.repartition(n_part, VID).persist()
    ranks.count()

    start_iter = 0
    if checkpointer is not None:
        resumed = checkpointer.resume(spark)
        if resumed is not None:
            start_iter, ranks = resumed
            ranks = ranks.repartition(n_part, VID).persist()
            ranks.count()

    edges = graph.edges  # [src, dst, weight] partitioned by src
    converged = False
    iterations = start_iter
    l1_history: list = []

    # hash-partitioned vertex table, materialized once — the renumber map's
    # own partitioning is by degree range, so joining it per-iteration would
    # reshuffle V rows every superstep
    verts = graph.vertices().repartition(n_part, VID).persist()

    # skip the per-iteration dangling fold entirely when no sinks exist
    has_dangling = vstate.filter(F.col("out_wsum") == 0.0).limit(1).count() > 0

    for it in range(start_iter, max_iter):
        # dangling mass: scalar fold, not edge traffic (pagerank_impl:238-247)
        joined = ranks.join(vstate, VID)
        if has_dangling:
            dangling = (
                joined.filter(F.col("out_wsum") == 0.0)
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
        else:
            dangling = 0.0

        # pre-divide (pagerank_impl:249-261): contribution = rank / out_wsum
        contribs = joined.filter(F.col("out_wsum") > 0.0).select(
            F.col(VID).alias(SRC), (F.col("rank") / F.col("out_wsum")).alias("contrib")
        )
        gathered = (
            edges.join(contribs, SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg(F.sum(F.col("contrib") * F.col(WGT)).alias("gather"))
        )

        if pers is None:
            const = (alpha * dangling + (1.0 - alpha)) / V
            new_ranks = (
                verts
                .join(gathered, VID, "left")
                .fillna(0.0, ["gather"])
                .select(
                    VID,
                    (F.lit(alpha) * F.col("gather") + F.lit(const)).alias("rank"),
                )
            )
        else:
            mass = alpha * dangling + (1.0 - alpha)
            new_ranks = (
                pers.join(gathered, VID, "left")
                .fillna(0.0, ["gather"])
                .select(
                    VID,
                    (
                        F.lit(alpha) * F.col("gather")
                        + F.lit(mass) * F.col("p_norm")
                    ).alias("rank"),
                )
            )
        # truncate lineage + reset stats every iteration — without this the
        # logical plan (or its propagated size estimate) grows per superstep
        # and planning cost explodes (SURVEY §7; see truncate_state)
        new_ranks = truncate_state(new_ranks, n_part, VID)

        l1 = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), VID)
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
            or 0.0
        )
        ranks.unpersist()
        ranks = new_ranks
        iterations = it + 1
        l1_history.append(l1)

        if checkpointer is not None:
            checkpointer.save(ranks, iterations, {"l1": l1, "dangling": dangling})

        if tol > 0 and l1 < tol:
            converged = True
            break

    if tol <= 0:
        converged = True
    if not converged and fail_on_nonconvergence:
        raise RuntimeError(
            f"PageRank failed to converge in {max_iter} iterations (L1={l1_history[-1]})"
        )

    out = ranks.select(F.col(VID).alias("vertex"), F.col("rank").alias("pagerank"))
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    verts.unpersist()
    vstate.unpersist()
    if pers is not None:
        pers.unpersist()
    return PageRankResult(out, converged, iterations, l1_history)


def _renumber_values(graph: LinkGraph, df: DataFrame, value_name: str) -> DataFrame:
    """Map a [vertex, values] DataFrame of external ids to internal ids
    (reference ``pagerank.py:33-40`` → ``number_map.py:334``)."""
    cols = df.columns
    vcol, valcol = cols[0], cols[1]
    sel = df.select(F.col(vcol).alias("_ext"), F.col(valcol).cast("double").alias(value_name))
    if graph.renumber_map is None:
        return sel.withColumnRenamed("_ext", VID)
    m = graph.renumber_map.select(F.col("ext_id").alias("_ext"), VID)
    return sel.join(F.broadcast(m), "_ext").select(VID, value_name)
