"""Utility operators (reference ``cugraph/utilities``).

- ``get_traversed_cost`` — reference ``utilities/path_retrieval.py:28-100``
  (C++ kernel walks each predecessor chain): sum edge weights along the
  BFS/SSSP predecessor tree back to the source. The host/CUDA walk is
  restated as POINTER DOUBLING: each round every vertex adds its current
  ancestor's accumulated cost and jumps to the ancestor's ancestor, so an
  L-deep tree finishes in ceil(log2 L) supersteps of one self-join each —
  the same shape as the WCC pointer-jump loop, no per-path sequential work.
- ``sample_groups`` — reference ``utilities/utils.py:488-512``: uniform
  n-per-group sampling; a per-group ``row_number`` over a seeded random
  order (groups sample in parallel; no global shuffle of the full frame).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F

from .graph import truncate_state

_UNREACHED = 1.7976931348623157e308  # DBL_MAX, the reference's sentinel


def get_traversed_cost(
    df: DataFrame,
    source: int,
    edge_df: DataFrame,
    source_col: str = "src",
    dest_col: str = "dst",
    value_col: str = "weight",
    max_rounds: int = 64,
) -> DataFrame:
    """DF[vertex, info] — per-vertex sum of edge weights along the
    predecessor path to ``source``.

    ``df`` is a BFS/SSSP result frame [vertex, distance, predecessor];
    ``edge_df`` holds the weighted edges. As in the reference, the weight
    relation is symmetrized with min-dedup before lookup, and vertices
    with no path get DBL_MAX.
    """
    for need in ("vertex", "distance", "predecessor"):
        if need not in df.columns:
            raise ValueError(
                "DataFrame does not appear to be a BFS or "
                f"SSP result - '{need}' column missing"
            )
    e = edge_df.select(
        F.col(source_col).alias("s"),
        F.col(dest_col).alias("d"),
        F.col(value_col).cast("double").alias("w"),
    )
    wsym = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d"), "w"))
        .groupBy("s", "d")
        .agg(F.min("w").alias("w"))
    )

    # init: cost = w(pred -> v); source carries 0; pred-less non-source
    # rows are unreachable
    base = df.select("vertex", F.col("predecessor").alias("anc"))
    state = (
        base.join(
            wsym,
            (base["anc"] == wsym["s"]) & (base["vertex"] == wsym["d"]),
            "left",
        )
        .select(
            "vertex",
            F.when(F.col("vertex") == source, F.lit(-1))
            .otherwise(F.col("anc"))
            .alias("anc"),
            F.when(F.col("vertex") == source, F.lit(0.0))
            .when(F.col("anc") == -1, F.lit(_UNREACHED))
            .otherwise(F.col("w"))
            .alias("cost"),
        )
    )
    state = truncate_state(state)

    n = df.count()
    rounds = min(max_rounds, max(1, math.ceil(math.log2(max(2, n))) + 1))
    for i in range(rounds):
        b = state.select(
            F.col("vertex").alias("_av"),
            F.col("anc").alias("_aanc"),
            F.col("cost").alias("_acost"),
        )
        # the pending count rides the materialization job via observe — no
        # separate per-round aggregation job (same idiom as wcc.py)
        obs = Observation(f"traversed_cost_{i}")
        nxt = (
            state.join(b, state["anc"] == b["_av"], "left")
            .select(
                "vertex",
                F.when(F.col("anc") == -1, F.lit(-1))
                .otherwise(F.coalesce(F.col("_aanc"), F.lit(-1)))
                .alias("anc"),
                F.when(F.col("anc") == -1, F.col("cost"))
                .otherwise(F.col("cost") + F.coalesce(F.col("_acost"), F.lit(0.0)))
                .alias("cost"),
            )
            .observe(
                obs,
                F.sum(F.when(F.col("anc") != -1, 1).otherwise(0)).alias("pending"),
            )
        )
        old = state
        state = truncate_state(nxt)
        old.unpersist()
        if not int(obs.get["pending"] or 0):
            break

    return state.select("vertex", F.col("cost").alias("info"))


def sample_groups(
    df: DataFrame, by: str, n_samples: int, seed: int | None = None
) -> DataFrame:
    """Uniformly sample ``n_samples`` rows per ``by`` group (reference
    ``utils.py:488-512``). ``n_samples=-1`` keeps everything."""
    if n_samples == -1:
        return df
    w = Window.partitionBy(by).orderBy(
        F.rand(seed) if seed is not None else F.rand()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_samples)
        .drop("_rn")
    )
