"""Chunked-CSR soak at R-MAT scale 21 (VERDICT r4 ask #7).

Pins the csr.py claim — "parity within noise at 33M edges" — with a
probe-annotated full-capacity measurement: DF-superstep PageRank vs the
chunked `applyInPandas` CSR gather, SAME prebuilt graph, fixed iteration
count, fresh subprocess per leg, legs INTERLEAVED (df, csr, df, csr, …)
so ambient drift hits both equally, and the pure-CPU capacity probe run
immediately before every leg (scaling_bench.probe_capacity).

The soak also exercises the r3 chunking change under real load: at
scale 21 the default 8M-edge cap makes every dense hash partition split
into multiple CSR chunk rows (33.5M edges / 32 partitions ≈ 1.05M/part —
below cap; so we ALSO run a forced-chunk leg at max_chunk_edges=262144,
~4 chunks per partition, to prove chunked gather costs the same).

Usage: python scripts/csr_soak.py [scale] [iters] [repeats]
Prints one RESULT json line; paste the numbers into BENCH.md.
"""

from __future__ import annotations

import json
import os
import statistics as st
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
from scaling_bench import probe_capacity  # noqa: E402

GEN = r"""
import sys
sys.path.insert(0, {repo!r})
from cugraph_spark.session import get_spark
from cugraph_spark.datagen import rmat_edges
from cugraph_spark.graph import LinkGraph
scale = int(sys.argv[1]); built = sys.argv[2]
spark = get_spark("csr_soak_gen", master="local[32]", shuffle_partitions=64,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "32g"}})
e = rmat_edges(spark, scale=scale, num_edges=16 * (1 << scale), seed=42)
g = LinkGraph.from_edges(e, directed=True)
g.edges.write.mode("overwrite").parquet(built)
print("GENERATED", g.edges.count())
spark.stop()
"""

LEG = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from cugraph_spark.session import get_spark
from cugraph_spark.graph import LinkGraph
built, variant, iters = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark("csr_soak", master="local[32]", shuffle_partitions=32,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                              "spark.driver.memory": "32g",
                              "spark.cleaner.periodicGC.interval": "20s"}})
edges = spark.read.parquet(built)
g = LinkGraph.from_edges(edges, directed=True, renumber=False)
t0 = time.time()
if variant == "df":
    from cugraph_spark.operators import pagerank
    pagerank(g, alpha=0.85, max_iter=iters, tol=0.0,
             unrenumber=False).ranks.count()
else:
    from cugraph_spark.csr import pagerank_csr
    kw = {{}}
    if variant == "csr_forced":
        kw["max_chunk_edges"] = 262_144
    pagerank_csr(g, alpha=0.85, max_iter=iters, tol=0.0,
                 unrenumber=False, **kw).count()
dt = time.time() - t0
print("LEG " + json.dumps({{"variant": variant, "sec": round(dt, 2),
                            "sec_per_iter": round(dt / iters, 3)}}))
spark.stop()
"""


def run_leg(built: str, variant: str, iters: int) -> dict:
    probe = st.median(probe_capacity(32))
    out = subprocess.run(
        [sys.executable, "-c", LEG.format(repo=REPO), built, variant, str(iters)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEG "):
            d = json.loads(line[4:])
            d["probe_spin32_sec"] = round(probe, 3)
            return d
    raise RuntimeError(f"{variant} leg failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    built = os.path.join(tempfile.gettempdir(), f"csr_soak_built_s{scale}")
    if not os.path.isdir(built):
        gen = subprocess.run(
            [sys.executable, "-c", GEN.format(repo=REPO), str(scale), built],
            capture_output=True, text=True, timeout=3600,
        )
        if "GENERATED" not in gen.stdout:
            raise RuntimeError(gen.stdout[-2000:] + gen.stderr[-2000:])
        print(gen.stdout.strip().splitlines()[-1])

    legs: dict[str, list] = {"df": [], "csr": [], "csr_forced": []}
    for r in range(repeats):
        for variant in ("df", "csr", "csr_forced"):
            d = run_leg(built, variant, iters)
            legs[variant].append(d)
            print("  ", d, flush=True)

    med = {v: st.median(x["sec_per_iter"] for x in legs[v]) for v in legs}
    result = {
        "scale": scale, "iters": iters, "repeats": repeats,
        "median_sec_per_iter": med,
        "csr_over_df": round(med["csr"] / med["df"], 3),
        "forced_over_csr": round(med["csr_forced"] / med["csr"], 3),
        "legs": legs,
    }
    print("RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
