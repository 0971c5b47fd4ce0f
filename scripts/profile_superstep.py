"""Profile PageRank per-superstep wall time under config variants.

Usage: python scripts/profile_superstep.py <parquet> <cores> <variant> [iters]

Prints one RESULT json line with per-iteration times so the steady-state
superstep cost (and its variance) is directly visible at each parallelism
level.  Variants toggle one hypothesis each for the scale-23 N->4N
scaling gap (see BENCH.md):
  base      — session defaults
  offheap   — Tungsten off-heap 16g (hash/sort buffers leave the GC heap)
  pgc       — ParallelGC instead of default G1 (batch throughput)
  noaqe     — adaptive execution off (per-stage replanning overhead)
  parts2x   — shuffle partitions = 2x cores (straggler smoothing)
  parts4x   — shuffle partitions = 4x cores
  offheap_pgc, offheap_parts2x — combinations
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from cugraph_spark.session import get_spark
from cugraph_spark.graph import LinkGraph
from cugraph_spark.operators import pagerank

path, cores, variant, iters = sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
extra = {{"spark.ui.showConsoleProgress": "false",
         "spark.cleaner.periodicGC.interval": "20s",
         "spark.driver.memory": "32g"}}
nshuffle = cores
if "offheap" in variant:
    extra["spark.memory.offHeap.enabled"] = "true"
    extra["spark.memory.offHeap.size"] = "16g"
if "pgc" in variant:
    extra["spark.driver.extraJavaOptions"] = "-XX:+UseParallelGC"
if "noaqe" in variant:
    extra["spark.sql.adaptive.enabled"] = "false"
if "parts2x" in variant:
    nshuffle = cores * 2
if "parts4x" in variant:
    nshuffle = cores * 4
if "nocoal" in variant:
    extra["spark.sql.adaptive.coalescePartitions.enabled"] = "false"
if "adv8m" in variant:
    extra["spark.sql.adaptive.advisoryPartitionSizeInBytes"] = "8m"
import os as _os
_ev = f"/tmp/evlog_{{variant}}_{{cores}}"
_os.makedirs(_ev, exist_ok=True)
extra["spark.eventLog.enabled"] = "true"
extra["spark.eventLog.dir"] = _ev
spark = get_spark("profile", master=f"local[{{cores}}]", shuffle_partitions=nshuffle,
                  extra_conf=extra)
t0 = time.time()
g = LinkGraph.from_edges(spark.read.parquet(path), directed=True)
E = g.number_of_edges()
if "intids" in variant:
    from pyspark.sql import functions as F
    e2 = (g.edges.select(F.col("src").cast("int").alias("src"),
                         F.col("dst").cast("int").alias("dst"), "weight")
          .repartition(nshuffle, "src").persist())
    e2.count()
    g.edges.unpersist()
    g.edges = e2
    m2 = g.renumber_map.select("ext_id", F.col("id").cast("int").alias("id")).persist()
    m2.count()
    g.renumber_map.unpersist()
    g.renumber_map = m2
build = time.time() - t0
fuse = 1
for _tok in variant.split("_"):
    if _tok.startswith("fuse"):
        fuse = int(_tok[4:])
res = pagerank(g, alpha=0.85, max_iter=iters, tol=0.0, unrenumber=False,
               fail_on_nonconvergence=False, fuse=fuse)
res.ranks.count()
secs = res.iter_secs
steady = sorted(secs[3:])
med = steady[len(steady) // 2]
print("RESULT " + json.dumps({{
    "cores": cores, "variant": variant, "nshuffle": nshuffle, "edges": E,
    "build_sec": round(build, 2),
    "iter_secs": [round(t, 2) for t in secs],
    "median_steady_sec": round(med, 3),
    "edges_per_sec": round(E / med, 1),
}}))
spark.stop()
"""


def main():
    path, cores, variant = sys.argv[1], sys.argv[2], sys.argv[3]
    iters = sys.argv[4] if len(sys.argv) > 4 else "15"
    out = subprocess.run(
        [sys.executable, "-c", RUNNER.format(repo=REPO), path, cores, variant, iters],
        capture_output=True, text=True, timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line)
            return
    print("FAILED", file=sys.stderr)
    print(out.stdout[-2000:] + "\n<<stderr>>\n" + out.stderr[-3000:], file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()
