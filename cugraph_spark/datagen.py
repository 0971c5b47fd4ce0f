"""Deterministic synthetic data generation.

Three generators, all seeded, no external data:
- ``pages_from_edges``: wrap any edge list into the Common-Crawl-style page
  table from BASELINE.json ``input_hint`` (url, warc_ts, html, text, lang) —
  one page per vertex, one ``<a href>`` per out-edge, so href-extraction over
  the pages must reproduce the edge list exactly (FIXTURES.md §1).
- ``rmat_edges``: Graph500 R-MAT edge generator matching the reference's
  benchmark workload (``benchmarks/cugraph/pytest-based/bench_algos.py:66-75``
  params a=0.57 b=0.19 c=0.19; generator API parity with
  ``python/cugraph/cugraph/generators/rmat.py:30-134``). Implemented
  Spark-side: ``spark.range(num_edges)`` + a vectorized pandas UDF doing the
  per-edge bit recursion with a counter-based hash (deterministic per row id,
  independent of partitioning — safe at any parallelism).
- ``derived_edges``: a deterministic edge table computed from the driver's
  TPC-H-ish parquet (arithmetic only, so a DuckDB oracle can reproduce it).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RMAT_A, RMAT_B, RMAT_C = 0.57, 0.19, 0.19


# --------------------------------------------------------------------- pages
def pages_from_edges(spark: SparkSession, edges: DataFrame) -> DataFrame:
    """Edge list [src,dst] (int ids) → pages table
    (url string, warc_ts timestamp, html binary, text string, lang string).

    Deterministic: hrefs in ascending dst order; text is the pinned
    extractor output for the html (byte-identical invariant, FIXTURES.md §1).
    """
    adj = (
        edges.groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("dsts"))
    )
    verts = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    full = verts.join(adj, verts.v == adj.src, "left").select(
        F.col("v").cast("long").alias("vid"),
        F.coalesce(F.col("dsts"), F.array().cast("array<long>")).alias("dsts"),
    )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )

    epoch = _dt.datetime(2025, 1, 1, tzinfo=_dt.timezone.utc)

    def _render(batches):
        for pdf in batches:
            urls, tss, htmls, texts = [], [], [], []
            for vid, dsts in zip(pdf["vid"], pdf["dsts"]):
                vid = int(vid)
                body_text = f"Welcome to site{vid}. This page links to {len(dsts)} sites."
                hrefs = "".join(
                    f'<a href="https://site{int(d)}.test/">site{int(d)}</a>'
                    for d in dsts
                )
                html = (
                    f"<html><head><title>site{vid}</title></head>"
                    f"<body><p>{body_text}</p>{hrefs}</body></html>"
                )
                urls.append(f"https://site{vid}.test/")
                tss.append(epoch + _dt.timedelta(seconds=vid))
                htmls.append(html.encode("utf-8"))
                texts.append(f"site{vid}\n{body_text}")
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": tss,
                    "html": htmls,
                    "text": texts,
                    "lang": "en",
                }
            )

    return full.mapInPandas(_render, schema)


# ---------------------------------------------------------------------- rmat
def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash (SplitMix64, public domain constant set) —
    deterministic per counter, no RNG state, safe under repartitioning."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _rand01(counter: np.ndarray, salt: int) -> np.ndarray:
    h = _splitmix64(counter.astype(np.uint64) * np.uint64(2654435761) + np.uint64(salt))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def rmat_edges(
    spark: SparkSession,
    scale: int,
    num_edges: int,
    a: float = RMAT_A,
    b: float = RMAT_B,
    c: float = RMAT_C,
    seed: int = 42,
    scramble_vertex_ids: bool = True,
    keep_id: bool = False,
) -> DataFrame:
    """R-MAT edges [src long, dst long]; Graph500 params by default
    (reference ``generators/rmat.py:30-134``, bench defaults
    ``bench_algos.py:66-75``). ``keep_id=True`` also emits the generator
    counter as an ``id`` column (a stable dense edge id — used by the
    generators facade's ``include_edge_ids``)."""
    fields = [T.StructField("src", T.LongType()), T.StructField("dst", T.LongType())]
    if keep_id:
        fields.append(T.StructField("id", T.LongType()))
    schema = T.StructType(fields)
    n_bits = scale
    pa, pb, pc = float(a), float(b), float(c)

    def _gen(batches):
        for pdf in batches:
            ctr = pdf["id"].to_numpy(dtype=np.int64)
            src = np.zeros(len(ctr), dtype=np.uint64)
            dst = np.zeros(len(ctr), dtype=np.uint64)
            for bit in range(n_bits):
                r = _rand01(ctr, seed * 1_000_003 + bit)
                # quadrant probabilities: a | b / c | d
                go_right = r >= (pa + pc)  # dst high bit
                go_down = ((r >= pa) & (r < pa + pc)) | (r >= pa + pb + pc)
                src = (src << np.uint64(1)) | go_down.astype(np.uint64)
                dst = (dst << np.uint64(1)) | go_right.astype(np.uint64)
            if scramble_vertex_ids:
                mask = np.uint64((1 << n_bits) - 1)
                src = _splitmix64(src + np.uint64(seed)) & mask
                dst = _splitmix64(dst + np.uint64(seed)) & mask
            out = {"src": src.astype(np.int64), "dst": dst.astype(np.int64)}
            if keep_id:
                out["id"] = ctr
            yield pd.DataFrame(out)

    base = spark.range(num_edges)
    return base.mapInPandas(_gen, schema)


# ------------------------------------------------------------- derived edges
def derived_edges(
    spark: SparkSession, sf_dir: str, num_vertices: int = 400
) -> DataFrame:
    """Deterministic edge table from the driver's lineitem parquet —
    arithmetic only so the DuckDB oracle reproduces it exactly:
    ``src = l_orderkey % K, dst = l_partkey % K, src != dst, DISTINCT``."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    k = num_vertices
    return (
        li.select(
            (F.col("l_orderkey") % k).cast("long").alias("src"),
            (F.col("l_partkey") % k).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def derived_edges_sql(num_vertices: int = 400) -> str:
    """DuckDB-side definition of ``derived_edges`` (same arithmetic)."""
    k = num_vertices
    return (
        f"SELECT DISTINCT CAST(l_orderkey % {k} AS BIGINT) AS src, "
        f"CAST(l_partkey % {k} AS BIGINT) AS dst "
        f"FROM lineitem WHERE (l_orderkey % {k}) != (l_partkey % {k})"
    )
