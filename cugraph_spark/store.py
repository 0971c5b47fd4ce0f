"""Bucketed graph persistence: save a built LinkGraph so a later session
reloads it WITHOUT re-running the build shuffle.

No reference analog — cuGraph graphs live in GPU memory and users
round-trip raw edge lists through cudf parquet
(``structure/graph_classes.py`` has no save/load). At Spark scale the
build shuffle (renumber joins + ``repartition(n, src)``) is the dominant
cost of `from_edges` on a 100 TB edge table, and it is pure waste to pay
it again for a graph that was already built once. ``save_graph`` writes
the INTERNAL edge frame as a parquet table bucketed+sorted by ``src``:
a bucketed scan reports ``HashPartitioning(src, n)``, so every per-src
join/aggregation the operators issue (the gather join of PageRank/WCC/
LPA supersteps, degree aggs, orientation joins) starts co-partitioned
with NO exchange. The renumber map and graph properties ride along as a
plain table + a one-row JSON manifest.

Bucketing requires a catalog table (``saveAsTable``) — Spark only
preserves bucket metadata through the catalog, never through
``parquet(path)``. Locally that is the default ``spark-warehouse`` dir;
on a real cluster, the metastore. Pass ``path=`` to pin an external
table location.
"""

from __future__ import annotations

import json
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession

from .graph import SRC, GraphProperties, LinkGraph


def save_graph(
    g: LinkGraph,
    name: str,
    buckets: int | None = None,
    mode: str = "errorifexists",
    path: str | None = None,
) -> None:
    """Persist ``g`` as catalog tables ``<name>_edges`` (bucketed by src),
    ``<name>_map`` (if renumbered), and ``<name>_meta`` (JSON manifest).

    ``buckets`` defaults to the graph's partition count so the reloaded
    bucketing matches what the operators expect; ``mode="overwrite"``
    replaces an existing saved graph.
    """
    n = int(buckets or g.num_partitions)
    w = (
        g.edges.write.format("parquet")
        .mode(mode)
        .bucketBy(n, SRC)
        .sortBy(SRC)
    )
    if path:
        w = w.option("path", f"{path.rstrip('/')}/{name}_edges")
    w.saveAsTable(f"{name}_edges")

    if g.renumber_map is not None:
        wm = g.renumber_map.write.format("parquet").mode(mode)
        if path:
            wm = wm.option("path", f"{path.rstrip('/')}/{name}_map")
        wm.saveAsTable(f"{name}_map")

    meta = {
        "num_partitions": n,
        "has_map": g.renumber_map is not None,
        "properties": asdict(g.properties),
    }
    mdf = g.edges.sparkSession.createDataFrame(
        [(json.dumps(meta),)], "meta STRING"
    )
    wj = mdf.write.format("parquet").mode(mode)
    if path:
        wj = wj.option("path", f"{path.rstrip('/')}/{name}_meta")
    wj.saveAsTable(f"{name}_meta")


def load_graph(spark: SparkSession, name: str) -> LinkGraph:
    """Reload a graph saved by :func:`save_graph`.

    The edge frame comes back as the bucketed catalog table — already
    hash-partitioned by ``src`` at the scan, so no build shuffle happens
    (assert: ``spark.table(f"{name}_edges").groupBy("src").count()``
    plans with zero Exchange nodes).
    """
    meta = json.loads(spark.table(f"{name}_meta").collect()[0][0])
    edges = spark.table(f"{name}_edges").persist()
    rmap: DataFrame | None = None
    if meta["has_map"]:
        rmap = spark.table(f"{name}_map").persist()
    return LinkGraph(
        spark,
        edges,
        rmap,
        GraphProperties(**meta["properties"]),
        int(meta["num_partitions"]),
    )


def drop_graph(spark: SparkSession, name: str) -> None:
    """Remove the three catalog tables of a saved graph (ignores absents)."""
    for suffix in ("_edges", "_map", "_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {name}{suffix}")
