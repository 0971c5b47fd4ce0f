"""Linear assignment (Hungarian / Jonker–Volgenant) operators.

Reference parity:
- ``hungarian(G, workers)``: ``linear_assignment/lap.py:18-105`` — min-cost
  assignment over a weighted bipartite graph; ``workers`` names one side,
  every other vertex is implicitly a job.  Returns ``(cost, DF[vertex,
  assignment])`` with external ids.
- ``dense_hungarian(costs, num_rows, num_columns)``: ``lap.py:107-137`` —
  row-major dense cost matrix → ``(cost, assignment array)``.

Architecture note (why this is driver-side): LAP is an inherently
sequential O(n³) shortest-augmenting-path computation over a DENSE n×n
potential table; the reference likewise solves it on a single device
(one GPU kernel over the whole matrix, not a multi-GPU/dask algorithm).
The Spark-native part of the operator is everything around the solve:
the bipartite cost block is assembled distributively (semi-joins against
the workers frame, renumber map joins) and only the n_workers × n_jobs
cost matrix — never the graph — is collected, behind an explicit
``max_cells`` gate (default 25M cells ≈ 200 MB float64).  A 100 TB graph
with a 10k×10k assignment subproblem works fine; a 10M×10M assignment
problem is not a LAP workload any engine solves exactly.

Determinism: numpy ``argmin`` tie-breaking is first-index, so for a fixed
cost matrix the assignment is bit-stable across runs and platforms.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import DST, EXT, SRC, VID, WGT, LinkGraph

#: refuse to collect a cost block bigger than this many cells.
MAX_DENSE_CELLS = 25_000_000

#: cost assigned to worker→job pairs with no edge (must dominate any real
#: path cost but stay finite so padded problems remain feasible).
_MISSING = 1e18


def _solve_square(cost: np.ndarray) -> np.ndarray:
    """Exact LAP on a square float64 matrix via shortest augmenting paths
    with dual potentials (Jonker–Volgenant style), O(n³).

    Returns ``row_for_col`` mapping j → assigned row (full permutation).
    Rows are introduced one at a time; each augmentation runs a Dijkstra
    over columns using the reduced costs ``c[i,j] - u[i] - v[j]``.
    """
    n = cost.shape[0]
    u = np.zeros(n + 1)  # row potentials, 1-indexed (0 = dummy)
    v = np.zeros(n + 1)  # column potentials
    p = np.zeros(n + 1, dtype=np.int64)  # p[j] = row matched to column j
    way = np.zeros(n + 1, dtype=np.int64)
    cols = np.arange(1, n + 1)

    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = np.full(n + 1, np.inf)
        used = np.zeros(n + 1, dtype=bool)
        while True:
            used[j0] = True
            i0 = p[j0]
            free = cols[~used[1:]]
            cur = cost[i0 - 1, free - 1] - u[i0] - v[free]
            better = cur < minv[free]
            upd = free[better]
            minv[upd] = cur[better]
            way[upd] = j0
            k = int(np.argmin(minv[free]))
            j1 = int(free[k])
            delta = minv[j1]
            um = used.copy()
            u[p[um]] += delta
            v[um] -= delta
            minv[~um] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = int(way[j0])
            p[j0] = p[j1]
            j0 = j1
    return p[1:] - 1  # row_for_col, 0-indexed


def dense_hungarian(costs, num_rows: int, num_columns: int, epsilon=None):
    """Min-cost assignment over a row-major dense cost matrix (reference
    ``lap.py:107-137``).  Rectangular matrices are padded square with
    zero-cost dummy rows/columns; dummy matches are dropped from the
    returned assignment (-1 for unassigned workers).

    ``epsilon`` mirrors the reference signature (a zero-threshold for the
    GPU solver's internal convergence test); the exact CPU solve here has
    no approximate step, so it is accepted and ignored.

    Returns ``(total_cost, assignment)`` where ``assignment[i]`` is the
    column assigned to row ``i``.
    """
    a = np.asarray(costs, dtype=np.float64).reshape(num_rows, num_columns)
    n = max(num_rows, num_columns)
    sq = np.zeros((n, n))
    sq[:num_rows, :num_columns] = a
    row_for_col = _solve_square(sq)
    col_for_row = np.full(n, -1, dtype=np.int64)
    col_for_row[row_for_col] = np.arange(n)
    assignment = col_for_row[:num_rows].copy()
    assignment[assignment >= num_columns] = -1
    real = assignment >= 0
    total = float(a[np.arange(num_rows)[real], assignment[real]].sum())
    return total, assignment


def hungarian(
    graph: LinkGraph,
    workers: DataFrame,
    epsilon=None,
    max_cells: int = MAX_DENSE_CELLS,
):
    """Min-cost worker→job assignment over a weighted bipartite graph
    (reference ``lap.py:18-105``).

    ``workers`` is a one-column DataFrame of external vertex ids naming one
    side of the bipartition; all other vertices are jobs.  Missing
    worker→job edges get a dominating finite cost, so the solve is always
    feasible; workers whose optimal match is such a phantom edge come back
    with ``assignment = null``.

    Returns ``(total_cost, DF[vertex, assignment])`` over external ids.
    """
    if not graph.properties.weighted:
        raise ValueError("hungarian requires edge weights (assignment costs)")

    wcol = workers.columns[0]
    w_ext = workers.select(F.col(wcol).alias("_w_ext")).distinct()
    # external → internal for the workers set (broadcast: worker sets are
    # small relative to the graph by construction of the problem)
    if graph.renumber_map is not None:
        m = graph.renumber_map
        w_int = (
            w_ext.join(
                F.broadcast(m.select(F.col(EXT).alias("_w_ext"), VID)),
                "_w_ext",
            )
            .select(F.col(VID).alias("_w"))
        )
    else:
        w_int = w_ext.select(F.col("_w_ext").cast("long").alias("_w"))

    # bipartite cost block: edges whose src is a worker and dst is not.
    # Distributed semi-joins — nothing graph-sized touches the driver.
    e = graph.edges.select(SRC, DST, WGT)
    block = (
        e.join(F.broadcast(w_int), e[SRC] == F.col("_w"), "left_semi")
        .join(F.broadcast(w_int), e[DST] == F.col("_w"), "left_anti")
    )
    # min over parallel edges so MultiGraph inputs stay well-defined
    block = block.groupBy(SRC, DST).agg(F.min(WGT).alias(WGT))

    rows = sorted(r[0] for r in w_int.collect())
    jobs = sorted(
        r[0]
        for r in block.select(F.col(DST)).distinct().collect()
    )
    if not rows or not jobs:
        raise ValueError("empty worker or job set")
    if len(rows) * len(jobs) > max_cells:
        raise ValueError(
            f"assignment block {len(rows)}x{len(jobs)} exceeds max_cells="
            f"{max_cells}; LAP is a dense single-node solve by nature — "
            "pre-filter candidate edges or raise max_cells explicitly"
        )
    ridx = {x: i for i, x in enumerate(rows)}
    cidx = {x: j for j, x in enumerate(jobs)}
    a = np.full((len(rows), len(jobs)), _MISSING)
    for r in block.collect():
        a[ridx[r[0]], cidx[r[1]]] = r[2]

    total, assignment = dense_hungarian(a.ravel(), len(rows), len(jobs), epsilon)
    pairs = []
    real_total = 0.0
    for i, j in enumerate(assignment):
        if j >= 0 and a[i, j] < _MISSING:
            pairs.append((int(rows[i]), int(jobs[j])))
            real_total += float(a[i, j])
        else:
            pairs.append((int(rows[i]), None))

    spark = graph.edges.sparkSession
    out = spark.createDataFrame(pairs, "vertex LONG, assignment LONG")
    out = graph.unrenumber(out, "vertex")
    out = graph.unrenumber(out, "assignment")
    return real_total, out
