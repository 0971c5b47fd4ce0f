"""spark-submit entry point for GNN minibatch export (BulkSampler).

The training-data shape the reference's bulk sampler serves
(``gnn/data_loading/bulk_sampler.py``): take a built graph, draw batched
multi-hop neighborhood samples for a seed list, and land them as
minibatch parquet partitions a GNN trainer streams back. Cluster usage::

    python scripts/make_pyfiles.py dist/engine.zip
    spark-submit --py-files dist/engine.zip jobs/bulk_sample_job.py \
        --graph saved_cc_graph --output s3://bucket/minibatches/run1 \
        --fanout 10,25 --batch-size 512 --renumber

``--graph NAME`` loads a graph persisted by ``store.save_graph`` (the
bucketed edge table — no rebuild shuffle); ``--edges PATH`` builds one
from a parquet edge list instead. Seeds default to every vertex, batched
round-robin; pass ``--seeds PATH`` for an explicit (vertex, batch) table.

Local smoke test (no cluster)::

    python jobs/bulk_sample_job.py --synthetic sf0.001 \
        --output /tmp/minibatches --fanout 3,2 --batch-size 32
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
    ap.add_argument("--graph", help="name of a store.save_graph graph to load")
    ap.add_argument("--edges", help="parquet path of an edge list (src, dst)")
    ap.add_argument("--synthetic", help="testdata sf dir for a synthetic run")
    ap.add_argument("--seeds", help="parquet path of a (vertex, batch) seed table")
    ap.add_argument("--output", required=True)
    ap.add_argument("--fanout", default="10,25")
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--seeds-per-call", type=int, default=200_000)
    ap.add_argument("--batches-per-partition", type=int, default=100)
    ap.add_argument("--renumber", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from cugraph_spark import store
    from cugraph_spark.gnn import BulkSampler
    from cugraph_spark.graph import LinkGraph
    from cugraph_spark.session import get_spark

    spark = get_spark("bulk_sample_job", shuffle_partitions=args.shuffle_partitions)
    fanout = [int(x) for x in args.fanout.split(",")]

    t0 = time.time()
    if args.graph:
        g = store.load_graph(spark, args.graph)
    elif args.edges:
        g = LinkGraph.from_edges(
            spark.read.parquet(args.edges), directed=True, renumber=True
        )
    elif args.synthetic:
        from cugraph_spark.datagen import derived_edges

        g = LinkGraph.from_edges(
            derived_edges(spark, f"/root/testdata/{args.synthetic}", num_vertices=200),
            directed=True,
            renumber=True,
        )
    else:
        ap.error("one of --graph / --edges / --synthetic is required")

    if args.seeds:
        seeds = spark.read.parquet(args.seeds)
        start_col, batch_col = seeds.columns[0], seeds.columns[1]
    else:
        # every vertex, batched round-robin by id
        seeds = g.vertices().select(
            F.col("id").alias("vertex"),
            (F.col("id") % F.lit(max(1, args.seeds_per_call // args.batch_size)))
            .alias("batch"),
        )
        if g.renumber_map is not None:
            seeds = g.unrenumber(seeds, "vertex")
        start_col, batch_col = "vertex", "batch"

    bs = BulkSampler(
        batch_size=args.batch_size,
        output_path=args.output,
        graph=g,
        seeds_per_call=args.seeds_per_call,
        batches_per_partition=args.batches_per_partition,
        renumber=args.renumber,
        fanout_vals=fanout,
        seed=args.seed,
    )
    bs.add_batches(seeds.select(start_col, batch_col), start_col, batch_col)
    bs.flush()

    n = spark.read.parquet(args.output).count()
    print(
        json.dumps(
            {
                "job": "bulk_sample",
                "sampled_rows": n,
                "fanout": fanout,
                "output": args.output,
                "renumber": args.renumber,
                "wall_sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
