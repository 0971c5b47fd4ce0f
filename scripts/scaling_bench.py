"""Scaling-efficiency evidence for the north rule (N → 4N cores).

No real cluster exists in this sandbox, so per the driver instruction we
run the SAME PageRank job at two parallelism levels — local[8] and
local[32] (1× vs 4× cores) — on the SAME input, and report throughput at
both plus scaling efficiency. Each timed run is a fresh subprocess (a
JVM's master can't change in-process).

The input is the reference's own benchmark workload: R-MAT with Graph500
parameters (``benchmarks/cugraph/pytest-based/bench_algos.py:66-75``) at
``--scale`` (default 21, edgefactor 16 ≈ 33M edges) — big enough that
per-iteration compute dominates scheduling overhead, which is the regime
the 1000-executor target actually lives in. The edge table is GENERATED
ONCE to parquet and both legs read the identical file (generation is not
the thing under test). PageRank runs a fixed 10 supersteps (tol=0) so
both runs do identical work.

Usage: python scripts/scaling_bench.py [sf_dir] [scale] [n_cores] [4n_cores]
Appends a markdown section to BENCH.md and prints the JSON result.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from cugraph_spark.session import get_spark
from cugraph_spark.datagen import rmat_edges
scale = int(sys.argv[1]); path = sys.argv[2]
spark = get_spark("rmat_gen", master="local[32]", shuffle_partitions=32,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
rmat_edges(spark, scale=scale, num_edges=16 * (1 << scale), seed=42) \
    .write.mode("overwrite").parquet(path)
print("GENERATED")
spark.stop()
"""

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from cugraph_spark.session import get_spark
from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import pagerank

cores = int(sys.argv[1]); path = sys.argv[2]
warmup_chunks, chunks, chunk_iters = 2, 6, 5
spark = get_spark("scaling_bench", master=f"local[{{cores}}]", shuffle_partitions=cores,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                              "spark.cleaner.periodicGC.interval": "20s",
                              "spark.driver.memory": "32g"}})
t0 = time.time()
g = LinkGraph.from_edges(spark.read.parquet(path), directed=True)
E = g.number_of_edges()
build_s = time.time() - t0
# chunked measurement with untimed warmup: JIT/codegen warm-up dominates
# the first supersteps, and single-JVM runs show multi-second GC/VM noise
# spikes — the MEDIAN chunk is the steady-state throughput estimate
times = []
for c in range(warmup_chunks + chunks):
    t0 = time.time()
    res = pagerank(g, alpha=0.85, max_iter=chunk_iters, tol=0.0, unrenumber=False,
                   fail_on_nonconvergence=False)
    res.ranks.count()
    if c >= warmup_chunks:
        times.append(time.time() - t0)
    res.unpersist()
times.sort()
med = times[len(times) // 2]
print("RESULT " + json.dumps({{
    "cores": cores, "edges": E, "build_sec": round(build_s, 3),
    "chunk_iters": chunk_iters,
    "chunk_secs": [round(t, 2) for t in times],
    "median_sec_per_iter": round(med / chunk_iters, 3),
    "edges_per_sec": round(E * chunk_iters / med, 1),
}}))
spark.stop()
"""


def _sub(code: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code] + list(args),
        capture_output=True, text=True, timeout=3600,
    )
    return out.stdout + "\n<<stderr>>\n" + out.stderr


def run(cores: int, path: str) -> dict:
    out = _sub(RUNNER.format(repo=REPO), str(cores), path)
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"run failed (cores={cores}):\n{out[-3000:]}")


def main():
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_hi = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    path = os.path.join(tempfile.gettempdir(), f"rmat_s{scale}.parquet")
    if not os.path.exists(path):
        out = _sub(GEN.format(repo=REPO), str(scale), path)
        if "GENERATED" not in out:
            raise RuntimeError(f"generation failed:\n{out[-3000:]}")
    r8 = run(n_lo, path)
    r32 = run(n_hi, path)
    eff = (r32["edges_per_sec"] / r8["edges_per_sec"]) / 4.0
    result = {"n_cores": r8, "4n_cores": r32, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    md = f"""
## Scaling evidence (N → 4N cores, sandbox analog of N → 4N executors)

Same PageRank job — R-MAT scale {scale}, edgefactor 16 (Graph500 params
a/b/c = 0.57/0.19/0.19, the reference's own benchmark workload), generated
once to parquet, 2 untimed warm-up chunks then 6 timed chunks of 5
supersteps (median chunk = steady state; single-JVM runs show occasional
multi-second GC/VM noise spikes) — at two parallelism levels, fresh JVM
each:

| cores | edges | build sec | median sec/iter | edges/sec | chunk secs (sorted) |
|---|---|---|---|---|---|
| {r8["cores"]} (N) | {r8['edges']} | {r8['build_sec']} | {r8['median_sec_per_iter']} | {r8['edges_per_sec']} | {r8['chunk_secs']} |
| {r32["cores"]} (4N) | {r32['edges']} | {r32['build_sec']} | {r32['median_sec_per_iter']} | {r32['edges_per_sec']} | {r32['chunk_secs']} |

**Scaling efficiency (throughput ratio / 4): {round(eff, 3)}**
(north-rule target ≥ 0.8 between cluster sizes; local-mode cores are the
sandbox stand-in for executors — shuffle partitioning is sized to cores in
both runs, so the partition/shuffle discipline is what is being measured.)
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
