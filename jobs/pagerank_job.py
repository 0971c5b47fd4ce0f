"""spark-submit entry point for the north-rule PageRank job.

Cluster usage (the north rule's deployment shape)::

    python scripts/make_pyfiles.py dist/engine.zip
    spark-submit --py-files dist/engine.zip jobs/pagerank_job.py \
        --pages s3://bucket/cc-pages/ --output s3://bucket/ranks/ \
        --checkpoints s3://bucket/ckpt/run1 --tol 1e-6

Reads the Common-Crawl-style page table (Iceberg table name or parquet
path), extracts href edges with the vectorized Arrow UDFs, builds the
LinkGraph, runs PageRank to convergence with per-iteration checkpointing
(resumable: re-running with the same --checkpoints dir continues from the
last complete iteration), and writes [url, pagerank] parquet.

Local smoke test (no cluster)::

    python jobs/pagerank_job.py --synthetic sf0.001 --output /tmp/ranks
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs without --py-files: make the repo importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="Iceberg table name or parquet path of the page table")
    ap.add_argument("--synthetic", help="testdata sf dir name for a synthetic run (e.g. sf0.001)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoints", default=None)
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=100)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from cugraph_spark.session import get_spark
    from cugraph_spark.graph import LinkGraph
    from cugraph_spark.ingest import pages_to_edges, read_pages, url_edges_to_int
    from cugraph_spark.operators import pagerank
    from cugraph_spark.checkpoint import CheckpointManager

    spark = get_spark("pagerank_job", shuffle_partitions=args.shuffle_partitions)

    t0 = time.time()
    if args.synthetic:
        from cugraph_spark.datagen import derived_edges, pages_from_edges

        seed = derived_edges(spark, f"/root/testdata/{args.synthetic}", num_vertices=200)
        pages = pages_from_edges(spark, seed)
    else:
        pages = read_pages(spark, args.pages)

    url_edges = pages_to_edges(pages)
    edges = url_edges_to_int(url_edges) if args.synthetic else url_edges
    g = LinkGraph.from_edges(edges, directed=True, renumber=True)
    n_edges = g.number_of_edges()
    build_s = time.time() - t0

    ckpt = (
        CheckpointManager(args.checkpoints, "pagerank") if args.checkpoints else None
    )
    t0 = time.time()
    res = pagerank(
        g,
        alpha=args.alpha,
        max_iter=args.max_iter,
        tol=args.tol,
        checkpointer=ckpt,
        fail_on_nonconvergence=False,
    )
    res.ranks.write.mode("overwrite").parquet(args.output)
    pr_s = time.time() - t0

    print(
        json.dumps(
            {
                "edges": n_edges,
                "build_sec": round(build_s, 3),
                "pagerank_sec": round(pr_s, 3),
                "iterations": res.iterations,
                "converged": res.converged,
                "edges_per_sec": round(n_edges * res.iterations / max(pr_s, 1e-9), 1),
                "output": args.output,
            }
        )
    )


if __name__ == "__main__":
    main()
