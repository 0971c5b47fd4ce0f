"""ECG — Ensemble Clustering for Graphs.

Reference parity: ``python/cugraph/cugraph/community/ecg.py:11-104``
(``ecg(G, min_weight=0.05, ensemble_size=16) → DF[vertex, partition]``);
the C++ kernel implements Poulin & Théberge (arXiv:1809.05578): run
truncated (one-level) Louvain on an ensemble of permutations of the
graph, reweight each edge by how often its endpoints co-cluster across
the ensemble (floored at ``min_weight``), then run full Louvain on the
reweighted graph.

Spark mapping: each ensemble member is ONE level of the deterministic
synchronous local-move under a seeded bijective id permutation
(``perm_r(i) = (a_r·i + b_r) mod p``, p prime > V) — permuting ids
changes every smallest-id tie-break and the parity schedule, which is
exactly the role vertex-visit-order randomization plays in the
sequential algorithm, while keeping each member fully deterministic and
reproducible.  Co-membership counting is one join per member over the
canonical edge frame; the final phase reuses :func:`louvain` unchanged.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..graph import VID, LinkGraph, truncate_state
from .louvain import _canonical_undirected, _local_move

_ENSEMBLE_PRIMES = [
    (1299721, 7),
    (15485863, 13),
    (32452843, 29),
    (49979687, 41),
    (67867967, 53),
    (86028121, 67),
    (104395301, 79),
    (122949823, 97),
    (141650939, 113),
    (160481183, 131),
    (179424673, 151),
    (198491317, 173),
    (217645177, 193),
    (236887691, 211),
    (256203161, 233),
    (275604541, 251),
]


def _next_prime_above(n: int) -> int:
    def is_prime(x: int) -> bool:
        if x < 2:
            return False
        i = 2
        while i * i <= x:
            if x % i == 0:
                return False
            i += 1
        return True

    p = max(n + 1, 2)
    while not is_prime(p):
        p += 1
    return p


def ecg(
    graph: LinkGraph,
    min_weight: float = 0.05,
    ensemble_size: int = 16,
    max_iter: int = 10,
    resolution: float = 1.0,
    unrenumber: bool = True,
):
    """Returns ``(DF[vertex, partition], modularity)`` — the reference
    returns only the partition frame; the modularity of the final Louvain
    phase rides along like :func:`louvain`'s."""
    from .louvain import louvain as _full_louvain

    n_part = graph.num_partitions
    V = graph.number_of_vertices()
    p = _next_prime_above(V)

    edges = truncate_state(_canonical_undirected(graph), n_part, "a")
    nonloops = edges.filter(F.col("a") != F.col("b"))
    both = nonloops.select(F.col("a").alias("i"), F.col("b").alias("j"), "w").union(
        nonloops.select(F.col("b").alias("i"), F.col("a").alias("j"), "w")
    )
    deg = both.groupBy("i").agg(F.sum("w").alias("k"))
    two_m = deg.agg(F.sum("k")).collect()[0][0] or 0.0
    if two_m == 0:
        out, q = _full_louvain(graph, unrenumber=unrenumber)
        edges.unpersist()
        return out, q
    deg = truncate_state(deg, n_part, "i")

    # ---- ensemble: one local-move level per seeded id permutation --------
    votes = None  # [a, b, same_cnt]
    votes_base = None  # last compacted+persisted votes frame
    for r in range(ensemble_size):
        idx = r
        a_r, b_r = _ENSEMBLE_PRIMES[idx % len(_ENSEMBLE_PRIMES)]
        while a_r % p == 0:
            # a_r ≡ 0 (mod p) degenerates perm to the constant b_r (every
            # pair co-clusters, corrupting this member's votes); the table
            # holds distinct primes so at most one entry can equal p —
            # advance to the next
            idx += 1
            a_r, b_r = _ENSEMBLE_PRIMES[idx % len(_ENSEMBLE_PRIMES)]
        perm = lambda c: (F.lit(a_r) * c + F.lit(b_r)) % F.lit(p)  # noqa: E731
        pboth = both.select(
            perm(F.col("i")).alias("i"), perm(F.col("j")).alias("j"), "w"
        )
        pdeg = truncate_state(
            deg.select(perm(F.col("i")).alias("i"), "k"), n_part, "i"
        )
        comm0 = truncate_state(pdeg.select("i", F.col("i").alias("c")), n_part, "i")
        comm = _local_move(pboth, pdeg, comm0, two_m, resolution, n_part, max_iter)

        ca = comm.select(F.col("i").alias("_pa"), F.col("c").alias("_ca"))
        cb = comm.select(F.col("i").alias("_pb"), F.col("c").alias("_cb"))
        member_votes = (
            nonloops.select(
                "a", "b", perm(F.col("a")).alias("_pa"), perm(F.col("b")).alias("_pb")
            )
            .join(ca, "_pa")
            .join(cb, "_pb")
            .select(
                "a",
                "b",
                F.when(F.col("_ca") == F.col("_cb"), F.lit(1)).otherwise(0).alias("s"),
            )
        )
        votes = member_votes if votes is None else votes.union(member_votes)
        if (r + 1) % 4 == 0 or r == ensemble_size - 1:
            new_votes = truncate_state(
                votes.groupBy("a", "b").agg(F.sum("s").alias("s")), n_part, "a"
            )
            # truncate_state materialized new_votes eagerly, so the prior
            # compacted frame is no longer referenced — release it now
            # rather than leaking ensemble_size/4 cached E-row frames
            if votes_base is not None:
                votes_base.unpersist()
            votes_base = new_votes
            votes = new_votes
        comm.unpersist()
        pdeg.unpersist()

    # ---- reweight: floor at min_weight, scale by co-membership share -----
    reweighted = (
        nonloops.join(votes, ["a", "b"], "left")
        .fillna(0, ["s"])
        .select(
            "a",
            "b",
            (
                F.lit(min_weight)
                + F.lit(1.0 - min_weight) * (F.col("s") / F.lit(float(ensemble_size)))
            ).alias("w"),
        )
    )

    # ---- final: full Louvain on the reweighted graph ---------------------
    # Build a LinkGraph over the INTERNAL ids (no re-renumbering) so the
    # result maps back through the original graph's renumber map.
    rg = LinkGraph.from_edges(
        reweighted.select(
            F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w").alias("weight")
        ),
        weight="weight",
        directed=False,
        renumber=False,
        num_partitions=n_part,
    )
    out, modularity = _full_louvain(
        rg, max_iter=max_iter, resolution=resolution, unrenumber=False
    )
    rg.unpersist()
    edges.unpersist()
    deg.unpersist()
    if hasattr(votes, "is_cached") and votes.is_cached:
        votes.unpersist()

    # isolated vertices (no edges) never enter the ensemble — they come back
    # as singleton communities so the result is size V like the reference's
    out = (
        graph.vertices()
        .select(F.col(VID).alias("vertex"))
        .join(out, "vertex", "left")
        .select("vertex", F.coalesce("partition", F.col("vertex")).alias("partition"))
    )
    if unrenumber:
        out = graph.unrenumber(out, "vertex")
        if graph.renumber_map is not None:
            canon = out.groupBy("partition").agg(F.min("vertex").alias("_c"))
            out = out.join(canon, "partition").select(
                "vertex", F.col("_c").alias("partition")
            )
    return out, float(modularity)
