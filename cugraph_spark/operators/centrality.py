"""Centrality — degree, HITS, Katz, eigenvector.

Reference parity:
- degree_centrality: ``centrality/degree_centrality.py:21-65`` — degree /
  (V − 1), normalized by default.
- HITS: ``link_analysis/hits.py:25-124``; C++ update/normalize loop
  ``hits_impl.cuh:41-93`` — alternate authority ← Σ hub(in-nbrs),
  hub ← Σ auth(out-nbrs), L1-normalize both, converge on hub delta.
- Katz: ``centrality/katz_centrality.py:23-171`` — x ← α·A x + β,
  L2-normalized at the end.
- eigenvector: ``centrality/eigenvector_centrality.py:26-112`` — power
  iteration with L2 normalization.

All four are the same superstep shape as PageRank (SURVEY §2.1): the
persisted src-partitioned edge table joins the V-row state, groupBy-sum
gathers, scalar aggs fold; localCheckpoint per iteration cuts lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..graph import DST, SRC, VID, WGT, LinkGraph, truncate_state


def degree_centrality(graph: LinkGraph, normalized: bool = True) -> DataFrame:
    """DF[vertex, degree_centrality] — (in+out degree) / (V−1)."""
    V = graph.number_of_vertices()
    deg = graph.degrees()
    c = (F.col("in_degree") + F.col("out_degree")).cast("double")
    if normalized:
        c = c / F.lit(float(max(V - 1, 1)))
    out = deg.select(F.col(VID).alias("vertex"), c.alias("degree_centrality"))
    return graph.unrenumber(out, "vertex")


def hits(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-5,
    nstart: DataFrame | None = None,
    normalized: bool = True,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[vertex, hubs, authorities] — alternating gathers, L1 normalize
    each half-step (hits_impl.cuh:41-93), converge on Σ|hub−hub_old|.

    ``nstart`` (``link_analysis/hits.py:49-56``): DF[vertex, values] of
    initial hub guesses in EXTERNAL ids; vertices absent from nstart keep
    the uniform 1/V start.  HITS is a power iteration on AᵀA, so any
    non-degenerate start converges to the same fixpoint — nstart shifts
    the iteration count, not the answer."""
    n_part = graph.num_partitions
    V = graph.number_of_vertices()
    edges = graph.edges.select(SRC, DST)

    state = graph.vertices().select(
        VID, F.lit(1.0 / V).alias("hub"), F.lit(1.0 / V).alias("auth")
    )
    if nstart is not None:
        g0 = nstart.select(
            F.col("vertex").alias("_ext"), F.col("values").cast("double").alias("_h0")
        )
        if graph.renumber_map is not None:
            from ..graph import EXT

            g0 = g0.join(
                graph.renumber_map.withColumnRenamed(EXT, "_ext"), "_ext"
            ).select(VID, "_h0")
        else:
            g0 = g0.select(F.col("_ext").alias(VID), "_h0")
        state = (
            state.join(g0, VID, "left")
            .select(VID, F.coalesce("_h0", "hub").alias("hub"), "auth")
        )
    state = cached = truncate_state(state, n_part, VID)

    for it in range(max_iter):
        # ONE materialization per iteration: the raw auth gather, the raw
        # hub gather chained over it, and the previous hub value all land in
        # one [id, hub_raw, auth_raw, _old] frame whose max-scalars ride the
        # same job via observe (the old loop recomputed the E-row gather
        # three times per iteration for h_max/a_max/delta — VERDICT r01 #5)
        # authorities ← Σ prev hubs over in-edges (hits_impl.cuh:118-127)
        auth_new = (
            edges.join(state.select(F.col(VID).alias(SRC), "hub"), SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg(F.sum("hub").alias("auth_raw"))
        )
        a = (
            state.select(VID, F.col("hub").alias("_old"))
            .join(auth_new.hint("shuffle_hash"), VID, "left")
            .fillna(0.0, ["auth_raw"])
        )
        # hubs ← Σ UNnormalized authorities over out-edges (the reference
        # scatters `authorities` to edges before normalizing, :128-142)
        hub_new = (
            edges.join(a.select(F.col(VID).alias(DST), "auth_raw"), DST)
            .groupBy(F.col(SRC).alias(VID))
            .agg(F.sum("auth_raw").alias("hub_raw"))
        )
        obs = Observation(f"hits_iter_{it}")
        raw = (
            a.join(hub_new.hint("shuffle_hash"), VID, "left")
            .fillna(0.0, ["hub_raw"])
            .observe(
                obs,
                F.max("hub_raw").alias("h_max"),
                F.max("auth_raw").alias("a_max"),
            )
        )
        raw = truncate_state(raw, n_part, VID)
        m = obs.get
        h_max = float(m["h_max"] or 1.0) or 1.0
        a_max = float(m["a_max"] or 1.0) or 1.0
        # max-normalize both (hits_impl.cuh:144-156, reduce_op::maximum) —
        # a cheap map over the cached frame, no second E-row pass
        new_state = raw.select(
            VID,
            (F.col("hub_raw") / F.lit(h_max)).alias("hub"),
            (F.col("auth_raw") / F.lit(a_max)).alias("auth"),
            "_old",
        )
        delta = (
            new_state.agg(F.sum(F.abs(F.col("hub") - F.col("_old")))).collect()[0][0]
            or 0.0
        )
        cached.unpersist()
        cached = raw  # the persisted handle backing the derived state
        state = new_state.drop("_old")
        if delta < tol:
            break

    if normalized:
        hs = state.agg(F.sum("hub"), F.sum("auth")).collect()[0]
        h_tot, a_tot = float(hs[0] or 1.0), float(hs[1] or 1.0)
        state = state.select(
            VID,
            (F.col("hub") / F.lit(h_tot)).alias("hub"),
            (F.col("auth") / F.lit(a_tot)).alias("auth"),
        )
    out = state.select(
        F.col(VID).alias("vertex"),
        F.col("hub").alias("hubs"),
        F.col("auth").alias("authorities"),
    )
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    return out


def katz_centrality(
    graph: LinkGraph,
    alpha: float | None = None,
    beta: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-6,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[vertex, katz_centrality] — x ← α·(Aᵀx) + β per iteration,
    final L2 normalization (katz_centrality.py:23-171). ``alpha`` defaults
    to 1/(max out-degree + 1), inside the 1/λ_max convergence bound the
    reference documents (:51-66)."""
    n_part = graph.num_partitions
    edges = graph.edges.select(SRC, DST, WGT)
    if alpha is None:
        dmax = (
            graph.degrees().agg(F.max("out_degree")).collect()[0][0] or 1
        )
        alpha = 1.0 / (dmax + 1.0)

    x = graph.vertices().select(VID, F.lit(0.0).alias("x"))
    x = truncate_state(x, n_part, VID)

    for it in range(max_iter):
        gathered = (
            edges.join(x.select(F.col(VID).alias(SRC), "x"), SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg(F.sum(F.col("x") * F.col(WGT)).alias("g"))
        )
        # carry the old value through the join and fold the L1 delta into
        # the same materialization job via observe (pagerank's pattern —
        # the separate delta collect cost an extra job per iteration)
        obs = Observation(f"katz_iter_{it}")
        new_x = truncate_state(
            x.select(VID, F.col("x").alias("_old"))
            .join(gathered.hint("shuffle_hash"), VID, "left")
            .fillna(0.0, ["g"])
            .select(
                VID,
                (F.lit(alpha) * F.col("g") + F.lit(beta)).alias("x"),
                "_old",
            )
            .observe(obs, F.sum(F.abs(F.col("x") - F.col("_old"))).alias("delta"))
            .drop("_old"),
            n_part,
            VID,
        )
        delta = float(obs.get["delta"] or 0.0)
        x.unpersist()
        x = new_x
        if delta < tol * graph.number_of_vertices():
            break

    l2 = x.agg(F.sqrt(F.sum(F.col("x") * F.col("x")))).collect()[0][0] or 1.0
    out = x.select(
        F.col(VID).alias("vertex"),
        (F.col("x") / F.lit(float(l2))).alias("katz_centrality"),
    )
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    return out


def eigenvector_centrality(
    graph: LinkGraph,
    max_iter: int = 100,
    tol: float = 1e-6,
    unrenumber: bool = True,
) -> DataFrame:
    """DF[vertex, eigenvector_centrality] — power iteration on Aᵀ with L2
    normalization per step (eigenvector_centrality.py:26-112)."""
    n_part = graph.num_partitions
    V = graph.number_of_vertices()
    edges = graph.edges.select(SRC, DST, WGT)

    x = cached = truncate_state(
        graph.vertices().select(VID, F.lit(1.0 / V).alias("x")), n_part, VID
    )

    for it in range(max_iter):
        gathered = (
            edges.join(x.select(F.col(VID).alias(SRC), "x"), SRC)
            .groupBy(F.col(DST).alias(VID))
            .agg(F.sum(F.col("x") * F.col(WGT)).alias("g"))
        )
        # materialize the RAW gather once, folding the L2 norm into the same
        # job via observe; the normalized state is then a scalar-divide map
        # over the cached frame (the old loop ran the full E-row gather
        # twice per iteration — once for l2, once to materialize —
        # VERDICT r01 #5), and the convergence delta is a V-row cached scan
        obs = Observation(f"eig_iter_{it}")
        raw = truncate_state(
            x.select(VID, F.col("x").alias("_old"))
            .join(gathered.hint("shuffle_hash"), VID, "left")
            .fillna(0.0, ["g"])
            .observe(obs, F.sqrt(F.sum(F.col("g") * F.col("g"))).alias("l2")),
            n_part,
            VID,
        )
        l2 = float(obs.get["l2"] or 1.0) or 1.0
        new_x = raw.select(VID, (F.col("g") / F.lit(l2)).alias("x"), "_old")
        delta = (
            new_x.agg(F.sum(F.abs(F.col("x") - F.col("_old")))).collect()[0][0]
            or 0.0
        )
        cached.unpersist()
        cached = raw
        x = new_x.drop("_old")
        if delta < tol * V:
            break

    out = x.select(F.col(VID).alias("vertex"), F.col("x").alias("eigenvector_centrality"))
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
    return out
