"""Scaling-efficiency evidence for the north rule (N → 4N cores).

No real cluster exists in this sandbox, so per the driver instruction we
run the SAME PageRank job at two parallelism levels — local[8] and
local[32] (1× vs 4× cores) — on the SAME input, and report throughput at
both plus scaling efficiency. Each run is a fresh subprocess (a JVM's
master can't change in-process).

The input is the reference's own benchmark workload: R-MAT with Graph500
parameters (``benchmarks/cugraph/pytest-based/bench_algos.py:66-75``) at
``--scale`` (default 21, edgefactor 16 ≈ 33M edges) — big enough that
per-iteration compute dominates scheduling overhead, which is the regime
the 1000-executor target actually lives in. PageRank runs a fixed 10
supersteps (tol=0) so both runs do identical work.

Usage: python scripts/scaling_bench.py [sf_dir] [scale]
Appends a markdown section to BENCH.md and prints the JSON result.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from cugraph_spark.session import get_spark
from cugraph_spark.graph import LinkGraph
from cugraph_spark.datagen import rmat_edges
from cugraph_spark.operators import pagerank

cores = int(sys.argv[1])
scale = int(sys.argv[2])
iters = 10
spark = get_spark("scaling_bench", master=f"local[{{cores}}]", shuffle_partitions=cores,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
t0 = time.time()
edges = rmat_edges(spark, scale=scale, num_edges=16 * (1 << scale), seed=42)
g = LinkGraph.from_edges(edges, directed=True)
E = g.number_of_edges()
build_s = time.time() - t0
t0 = time.time()
res = pagerank(g, alpha=0.85, max_iter=iters, tol=0.0, unrenumber=False,
               fail_on_nonconvergence=False)
res.ranks.count()
pr_s = time.time() - t0
print("RESULT " + json.dumps({{
    "cores": cores, "edges": E, "build_sec": round(build_s, 3),
    "pagerank_sec": round(pr_s, 3), "iterations": res.iterations,
    "edges_per_sec": round(E * res.iterations / pr_s, 1),
}}))
spark.stop()
"""


def run(cores: int, scale: int) -> dict:
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(scale)],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run failed (cores={cores}):\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    r8 = run(8, scale)
    r32 = run(32, scale)
    eff = (r32["edges_per_sec"] / r8["edges_per_sec"]) / 4.0
    result = {"n_cores": r8, "4n_cores": r32, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    md = f"""
## Scaling evidence (N → 4N cores, sandbox analog of N → 4N executors)

Same PageRank job — R-MAT scale {scale}, edgefactor 16 (Graph500 params
a/b/c = 0.57/0.19/0.19, the reference's own benchmark workload), fixed 10
supersteps — at two parallelism levels, fresh JVM each:

| cores | edges | pagerank sec (10 iters) | edges/sec |
|---|---|---|---|
| 8 (N) | {r8['edges']} | {r8['pagerank_sec']} | {r8['edges_per_sec']} |
| 32 (4N) | {r32['edges']} | {r32['pagerank_sec']} | {r32['edges_per_sec']} |

**Scaling efficiency (throughput ratio / 4): {round(eff, 3)}**
(north-rule target ≥ 0.8 between cluster sizes; local-mode cores are the
sandbox stand-in for executors — shuffle partitioning is sized to cores in
both runs, so the partition/shuffle discipline is what is being measured.)
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
