"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship full pipeline (synthetic page table →
href extraction → LinkGraph → PageRank) at sf0.001. ``queries()`` exposes
each implemented operator over the driver's parquet tables; ``oracle_sql()``
gives the DuckDB-equivalent ANSI SQL. Graph queries run over a
deterministic edge table derived arithmetically from ``lineitem``
(``src = l_orderkey % 1000, dst = l_partkey % 1000``) so the oracle can
reproduce the input exactly; text/vector queries run over ``documents`` /
``embeddings`` directly.

Float-valued results are rounded (6 digits for double math, 4 for
float32-embedding cosines) on BOTH sides so value-hash comparison is
immune to summation-order ulps.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cugraph_spark.datagen import derived_edges, pages_from_edges  # noqa: E402
from cugraph_spark.graph import LinkGraph  # noqa: E402
from cugraph_spark.graph_classes import BiPartiteGraph  # noqa: E402
from cugraph_spark.ingest import pages_to_edges, url_edges_to_int  # noqa: E402
from cugraph_spark.operators import (  # noqa: E402
    bfs,
    core_number,
    degree_centrality,
    ego_graph,
    eigenvector_centrality,
    hits,
    induced_subgraph,
    jaccard,
    katz_centrality,
    label_propagation,
    overlap,
    pagerank,
    sorensen,
    sssp,
    triangle_count,
    weakly_connected_components,
)
from cugraph_spark.operators import (  # noqa: E402
    batched_ego_graphs,
    betweenness_centrality,
    ecg,
    edge_betweenness_centrality,
    jaccard_w,
    k_truss,
    leiden,
    louvain,
    minimum_spanning_tree,
    overlap_w,
    sorensen_w,
    strongly_connected_components,
)
from cugraph_spark.operators import (  # noqa: E402
    analyze_clustering_edge_cut,
    analyze_clustering_modularity,
    attraction_at_hash_init,
    clustering_score_frame,
    hungarian,
)
from cugraph_spark.operators.bicliques import find_bicliques  # noqa: E402
from cugraph_spark import multimodal as mm  # noqa: E402
from cugraph_spark import streaming as st  # noqa: E402
from cugraph_spark import text as tx  # noqa: E402
from cugraph_spark import vector as vec  # noqa: E402

K = 1000  # vertex-space modulus for the derived edge table
P = tx.P
B = tx.B
PR_ITERS = 10
# walk_paths contract shared by _q_walk_paths and _sql_walk_paths (ADVICE r4:
# the Spark query and its SQL oracle must agree on these or the hash gate
# fails after a one-sided edit — keep them in one place)
WALK_SEED = 7
WALK_DEPTH = 4
LPA_ITERS = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _graph(spark, sf_dir, directed=True, renumber=True) -> LinkGraph:
    return LinkGraph.from_edges(
        derived_edges(spark, sf_dir, num_vertices=K),
        directed=directed,
        renumber=renumber,
    )


# ----------------------------------------------------------------- flagship
def entry(spark: SparkSession) -> DataFrame:
    """Full north-rule pipeline at sf0.001: derived edges → synthetic
    Common-Crawl-style page table → href-extraction pandas UDF → edge
    recovery → LinkGraph build (renumber) → PageRank to convergence."""
    sf_dir = "/root/testdata/sf0.001"
    seed_edges = derived_edges(spark, sf_dir, num_vertices=200)
    pages = pages_from_edges(spark, seed_edges)
    edges = url_edges_to_int(pages_to_edges(pages))
    g = LinkGraph.from_edges(edges, directed=True, renumber=True)
    res = pagerank(g, alpha=0.85, max_iter=100, tol=1e-6)
    return res.ranks.select(
        F.col("vertex").cast("long"), F.round("pagerank", 6).alias("pagerank")
    ).orderBy(F.col("pagerank").desc(), F.col("vertex"))


# ------------------------------------------------------------ spark queries
def _q_degrees(spark, sf_dir):
    g = _graph(spark, sf_dir)
    deg = g.degrees().withColumnRenamed("id", "vertex")
    out = g.unrenumber(deg, "vertex")
    return out.select(
        F.col("vertex").cast("long"),
        F.col("in_degree").cast("long"),
        F.col("out_degree").cast("long"),
    )


def _q_pagerank(spark, sf_dir):
    g = _graph(spark, sf_dir)
    # fuse=2: the driver oracle then certifies the FUSED execution path
    # value-exactly against the per-iteration DuckDB simulation
    res = pagerank(g, alpha=0.85, max_iter=PR_ITERS, tol=0.0, fuse=2)
    return res.ranks.select(
        F.col("vertex").cast("long"), F.round("pagerank", 6).alias("pagerank")
    )


def _q_pagerank_csr(spark, sf_dir):
    """PageRank over the per-partition chunked-CSR Arrow gather
    (csr.py:pagerank_csr) — same semantics as the DataFrame superstep, so
    it certifies against the SAME per-iteration DuckDB simulation.  A tiny
    max_chunk_edges forces every partition into multiple chunk rows, so the
    oracle row also certifies the multi-chunk gather."""
    from cugraph_spark.csr import pagerank_csr

    g = _graph(spark, sf_dir)
    out = pagerank_csr(
        g, alpha=0.85, max_iter=PR_ITERS, tol=0.0, max_chunk_edges=4096
    )
    return out.select(
        F.col("vertex").cast("long"), F.round("pagerank", 6).alias("pagerank")
    )


def _q_wcc(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return weakly_connected_components(g).select(
        F.col("vertex").cast("long"), F.col("labels").cast("long")
    )


def _q_lpa(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return label_propagation(g, max_iter=LPA_ITERS).select(
        F.col("vertex").cast("long"), F.col("label").cast("long")
    )


def _q_triangles(spark, sf_dir):
    g = _graph(spark, sf_dir, directed=False)
    return triangle_count(g).select(
        F.col("vertex").cast("long"), F.col("counts").cast("long")
    )


def _q_bfs(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return bfs(g, 1).select(
        F.col("vertex").cast("long"), F.col("distance").cast("int")
    )


def _q_two_hop(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    e1 = g.edges.select(F.col("src").alias("first"), F.col("dst").alias("_m"))
    e2 = g.edges.select(F.col("src").alias("_m"), F.col("dst").alias("second"))
    return (
        e1.join(e2, "_m")
        .filter(F.col("first") != F.col("second"))
        .select(F.col("first").cast("long"), F.col("second").cast("long"))
        .distinct()
    )


def _q_jaccard(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return jaccard(g).select(
        F.col("first").cast("long"),
        F.col("second").cast("long"),
        F.round("jaccard_coeff", 6).alias("jaccard_coeff"),
    )


def _q_sssp(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return sssp(g, 1).select(
        F.col("vertex").cast("long"), F.col("distance").cast("double")
    )


def _q_degree_centrality(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return degree_centrality(g).select(
        F.col("vertex").cast("long"),
        F.round("degree_centrality", 6).alias("degree_centrality"),
    )


def _q_overlap(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return overlap(g).select(
        F.col("first").cast("long"),
        F.col("second").cast("long"),
        F.round("overlap_coeff", 6).alias("overlap_coeff"),
    )


def _q_sorensen(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return sorensen(g).select(
        F.col("first").cast("long"),
        F.col("second").cast("long"),
        F.round("sorensen_coeff", 6).alias("sorensen_coeff"),
    )


def _q_hits(spark, sf_dir):
    g = _graph(spark, sf_dir)
    out = hits(g, max_iter=8, tol=0.0)
    return out.select(
        F.col("vertex").cast("long"),
        F.round("hubs", 6).alias("hubs"),
        F.round("authorities", 6).alias("authorities"),
    )


def _q_hits_nstart(spark, sf_dir):
    """hits(nstart=...) parity (link_analysis/hits.py:49-56): vertex 1
    starts with hub mass 10, everyone else keeps the uniform 1/V start;
    the oracle mirrors the seeded start exactly."""
    g = _graph(spark, sf_dir)
    ns = spark.createDataFrame([(1, 10.0)], "vertex LONG, values DOUBLE")
    out = hits(g, max_iter=8, tol=0.0, nstart=ns)
    return out.select(
        F.col("vertex").cast("long"),
        F.round("hubs", 6).alias("hubs"),
        F.round("authorities", 6).alias("authorities"),
    )


def _q_triangles_start(spark, sf_dir):
    """triangle_count(start_list=...) parity (community/
    triangle_count.py:45-122): whole-graph counts, output restricted to
    the start vertices."""
    g = _graph(spark, sf_dir, directed=False)
    return triangle_count(g, start_list=[1, 2, 3, 4, 5]).select(
        F.col("vertex").cast("long"), F.col("counts").cast("long")
    )


def _q_katz(spark, sf_dir):
    g = _graph(spark, sf_dir)
    out = katz_centrality(g, alpha=0.005, beta=1.0, max_iter=8, tol=0.0)
    return out.select(
        F.col("vertex").cast("long"),
        F.round("katz_centrality", 6).alias("katz_centrality"),
    )


def _q_eigenvector(spark, sf_dir):
    g = _graph(spark, sf_dir)
    out = eigenvector_centrality(g, max_iter=8, tol=0.0)
    return out.select(
        F.col("vertex").cast("long"),
        F.round("eigenvector_centrality", 6).alias("eigenvector_centrality"),
    )


def _q_core_number(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return core_number(g).select(
        F.col("vertex").cast("long"), F.col("core_number").cast("int")
    )


def _q_induced_subgraph(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    keep = spark.range(300).select(F.col("id").alias("vertex"))
    return induced_subgraph(g, keep).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )


def _q_ego_graph(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return ego_graph(g, 1, radius=2).select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )


def _q_scc(spark, sf_dir):
    g = _graph(spark, sf_dir)
    return strongly_connected_components(g).select(
        F.col("vertex").cast("long"), F.col("labels").cast("long")
    )


def _q_ktruss(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return k_truss(g, 4).select(F.col("src").cast("long"), F.col("dst").cast("long"))


def _q_louvain(spark, sf_dir):
    # renumber=False so the SQL oracle's ids (and thus its move tie-breaks
    # and parity alternation) line up with the engine's internal ids
    g = _graph(spark, sf_dir, renumber=False)
    parts, _q = louvain(g, max_iter=10, max_levels=3)
    return parts.select(
        F.col("vertex").cast("long"), F.col("partition").cast("long")
    )


def _q_mst_summary(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    mst = minimum_spanning_tree(g)
    return mst.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.sum("weight").cast("double").alias("total_weight"),
    )


def _q_traversed_cost(spark, sf_dir):
    """BFS tree from vertex 1 over the derived graph, then the
    pointer-doubling path-cost sum with deterministic arithmetic weights
    ((src*131 + dst*17) % 97 + 1) so the oracle reproduces them exactly."""
    from cugraph_spark.utilities import get_traversed_cost

    g = _graph(spark, sf_dir, renumber=False)
    res = bfs(g, 1)
    weighted = g.edges.select(
        "src",
        "dst",
        ((F.col("src") * 131 + F.col("dst") * 17) % 97 + 1)
        .cast("double")
        .alias("weight"),
    )
    out = get_traversed_cost(res, 1, weighted)
    return out.select(
        F.col("vertex").cast("long"),
        F.round(
            F.when(F.col("info") > 1e300, F.lit(-1.0)).otherwise(F.col("info")),
            6,
        ).alias("info"),
    )


def _q_bicliques(spark, sf_dir):
    """Greedy biclique mining over the part→supplier bipartite relation:
    machines = parts, features = suppliers, flag = part id divisible by 7.
    support=0.25 matches this table's co-occurrence density (co_cnt ≈
    0.3·deg), so the qualifying-feature sets are nontrivial."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = li.select(
        F.col("l_partkey").cast("long").alias("src"),
        F.col("l_suppkey").cast("long").alias("dst"),
        F.when(F.col("l_partkey") % 7 == 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flag"),
    ).distinct()
    _, S = find_bicliques(
        e, k=-1, support=0.25, min_features=1, min_machines=10
    )
    return S.select(
        F.col("id").cast("long"),
        F.col("total").cast("long"),
        F.col("machines").cast("long"),
        F.col("features").cast("long"),
        F.round("bad_ratio", 6).alias("bad_ratio"),
    )


def _q_betweenness(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    out = betweenness_centrality(g, k=list(range(16)), normalized=True)
    return out.select(
        F.col("vertex").cast("long"),
        F.round("betweenness_centrality", 6).alias("betweenness_centrality"),
    )


def _q_pagerank_personalized(spark, sf_dir):
    g = _graph(spark, sf_dir)
    pers = spark.range(0, K, 20).select(
        F.col("id").alias("vertex"), F.lit(1.0).alias("values")
    )
    res = pagerank(g, alpha=0.85, personalization=pers, max_iter=PR_ITERS, tol=0.0)
    return res.ranks.select(
        F.col("vertex").cast("long"), F.round("pagerank", 6).alias("pagerank")
    )


def _q_leiden(spark, sf_dir):
    # renumber=False: the SQL oracle's ids must match the engine's internal
    # ids so move tie-breaks and parity alternation line up (see _q_louvain)
    g = _graph(spark, sf_dir, renumber=False)
    parts, _q = leiden(g, max_iter=10, max_levels=3)
    return parts.select(
        F.col("vertex").cast("long"), F.col("partition").cast("long")
    )


def _q_ecg(spark, sf_dir):
    # renumber=False: oracle ids must match engine internal ids (see louvain)
    g = _graph(spark, sf_dir, renumber=False)
    parts, _q = ecg(g, ensemble_size=4, max_iter=6)
    return parts.select(
        F.col("vertex").cast("long"), F.col("partition").cast("long")
    )


def _q_edge_betweenness(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    out = edge_betweenness_centrality(g, k=list(range(16)), normalized=True)
    return out.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.round("betweenness_centrality", 6).alias("betweenness_centrality"),
    )


def _vertex_weights(spark):
    """Deterministic per-vertex weights 1 + (v % 7) for the weighted
    similarity queries (mirrored exactly in the oracle SQL)."""
    return spark.range(K).select(
        F.col("id").alias("vertex"), (F.lit(1.0) + (F.col("id") % 7)).alias("weight")
    )


def _q_wjaccard(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return jaccard_w(g, _vertex_weights(spark)).select(
        F.col("first").cast("long"),
        F.col("second").cast("long"),
        F.round("jaccard_coeff", 6).alias("jaccard_coeff"),
    )


def _q_woverlap(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return overlap_w(g, _vertex_weights(spark)).select(
        F.col("first").cast("long"),
        F.col("second").cast("long"),
        F.round("overlap_coeff", 6).alias("overlap_coeff"),
    )


def _q_wsorensen(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    return sorensen_w(g, _vertex_weights(spark)).select(
        F.col("first").cast("long"),
        F.col("second").cast("long"),
        F.round("sorensen_coeff", 6).alias("sorensen_coeff"),
    )


def _q_batched_ego(spark, sf_dir):
    g = _graph(spark, sf_dir, renumber=False)
    out = batched_ego_graphs(g, [1, 2, 3], radius=1)
    return out.select(
        F.col("seed").cast("long"),
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
    )


def _q_dedup_exact(spark, sf_dir):
    return tx.exact_dedup(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), F.col("dup_count").cast("long")
    )


def _q_doc_stats(spark, sf_dir):
    return tx.doc_stats(_docs(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    return tx.language_id(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), "pred_lang"
    )


def _q_token_rollup(spark, sf_dir):
    return tx.token_rollup(_docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    return tx.fingerprint(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), F.col("fp").cast("long")
    )


def _q_simhash(spark, sf_dir):
    return tx.simhash(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), F.col("simhash").cast("long")
    )


def _q_minhash_near_dup(spark, sf_dir):
    return tx.minhash_dedup(_docs(spark, sf_dir), threshold=0.0).select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        F.col("jaccard").cast("double"),
    )


def _q_embedding_topk(spark, sf_dir):
    out = vec.cosine_topk(_emb(spark, sf_dir), k=5, num_queries=20)
    return out.select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        (F.col("cosine") + F.lit(0.0)).alias("cosine"),  # normalize -0.0
        F.col("rank").cast("int"),
    )


def _q_embedding_lsh_topk(spark, sf_dir):
    out = vec.lsh_topk(_emb(spark, sf_dir), k=5)
    return out.select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        (F.col("cosine") + F.lit(0.0)).alias("cosine"),
        F.col("rank").cast("int"),
    )


def _q_embedding_neardup(spark, sf_dir):
    out = vec.embedding_neardup(_emb(spark, sf_dir), threshold=0.4)
    return out.select(
        F.col("vec_a").cast("long"),
        F.col("vec_b").cast("long"),
        (F.col("cosine") + F.lit(0.0)).alias("cosine"),
    )


def _q_ivf_topk(spark, sf_dir):
    out = vec.ivf_topk(_emb(spark, sf_dir), k=5, n_cells=16, n_probe=4)
    return out.select(
        F.col("query_id").cast("long"),
        F.col("neighbor_id").cast("long"),
        (F.col("cosine") + F.lit(0.0)).alias("cosine"),
        F.col("rank").cast("int"),
    )


_STREAM_SINK_N = 0


def _q_stream_user_totals(spark, sf_dir):
    """Streaming driver query: per-user running totals from the
    applyInPandasWithState operator over the events table replayed as a
    file-source stream (Trigger.AvailableNow).  The whole table arrives as
    one drop → one micro-batch → exactly one emission per key, equal to
    the batch aggregate, so the DuckDB oracle is a plain GROUP BY."""
    global _STREAM_SINK_N
    _STREAM_SINK_N += 1
    sdf = st.stateful_totals(st.stream_events(spark, f"{sf_dir}/events.parquet"))
    out = st.run_available_now(
        sdf, f"t_entry_user_totals_{_STREAM_SINK_N}", output_mode="update"
    )
    return out.select(
        F.col("user_id").cast("long"),
        F.col("n_events").cast("long"),
        (F.col("sum_value") + F.lit(0.0)).alias("sum_value"),
    )


def _q_image_stats(spark, sf_dir):
    """End-to-end multimodal pipeline: REAL binary image payloads (PPM,
    encoded executor-side) → pure-numpy decode inside the Arrow
    ``mapInPandas`` kernel → per-channel features.  The pixel law
    (byte i of asset a = (7a+i) mod 256, multimodal.py
    gradient_image_assets) is a closed form, so channel means and the
    dark-pixel fraction are exact single divisions any engine mirrors
    bit-identically."""
    feats = mm.image_features(mm.gradient_image_assets(spark, n=64))
    f = F.col("feature")
    return feats.select(
        F.col("asset_id").cast("long"),
        (f[0] + F.lit(0.0)).alias("mean_r"),
        (f[1] + F.lit(0.0)).alias("mean_g"),
        (f[2] + F.lit(0.0)).alias("mean_b"),
        (f[6] + F.lit(0.0)).alias("dark_frac"),
    )


def _q_audio_stats(spark, sf_dir):
    """End-to-end audio pipeline: REAL binary WAV payloads (RIFF PCM16,
    encoded executor-side) → pure-numpy chunk-walk decode inside the Arrow
    ``mapInPandas`` kernel → integer-exact per-asset stats.  The sample law
    (sample i of asset a = ((137a+31i) mod 4001) − 2000, multimodal.py
    chirp_audio_assets) is a closed integer form; rms/zcr/duration are a
    single IEEE division (+sqrt) over exact int64 accumulations, so every
    value is bit-identical in any engine mirroring the law."""
    feats = mm.audio_features(mm.chirp_audio_assets(spark, n=32))
    return feats.select(
        F.col("asset_id").cast("long"),
        F.col("sample_rate").cast("long"),
        F.col("n_samples").cast("long"),
        (F.col("duration_sec") + F.lit(0.0)).alias("duration_sec"),
        (F.col("rms") + F.lit(0.0)).alias("rms"),
        (F.col("zcr") + F.lit(0.0)).alias("zcr"),
        F.col("peak").cast("long"),
    )


def _q_video_stats(spark, sf_dir):
    """End-to-end video pipeline: REAL Y4M (YUV4MPEG2 Cmono) payloads,
    encoded executor-side → pure-numpy stream parse inside the Arrow
    ``mapInPandas`` kernel → integer-exact per-asset stats.  The luma law
    (pixel p of frame f of asset a = (11a+5f+3p) mod 251, multimodal.py
    checker_video_assets) is a closed integer form; mean/motion are one
    IEEE division over exact int64 sums, so values are bit-identical in
    any engine mirroring the law."""
    feats = mm.video_features(mm.checker_video_assets(spark, n=16))
    return feats.select(
        F.col("asset_id").cast("long"),
        F.col("width").cast("long"),
        F.col("height").cast("long"),
        F.col("n_frames").cast("long"),
        (F.col("duration_sec") + F.lit(0.0)).alias("duration_sec"),
        (F.col("mean_luma") + F.lit(0.0)).alias("mean_luma"),
        F.col("max_luma").cast("long"),
        (F.col("motion") + F.lit(0.0)).alias("motion"),
    )


def _q_stream_window_rollup(spark, sf_dir):
    """Streaming windowed aggregation driver query: 1-hour tumbling
    windows over the events stream (complete mode, AvailableNow), with the
    exact micro-unit sum so the window BUCKETING (epoch-aligned) and the
    aggregate arithmetic are both oracle-certified.  Window start is
    emitted as epoch seconds — integer in both engines."""
    global _STREAM_SINK_N
    _STREAM_SINK_N += 1
    sdf = st.windowed_event_rollup(
        st.stream_events(spark, f"{sf_dir}/events.parquet"),
        window="1 hour",
        watermark=None,
        exact=True,
    )
    out = st.run_available_now(
        sdf, f"t_entry_window_{_STREAM_SINK_N}", output_mode="complete"
    )
    return out.select(
        F.col("win_start").cast("long").alias("win_epoch"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        (F.col("sum_value") + F.lit(0.0)).alias("sum_value"),
    )


def _q_clustering_scores(spark, sf_dir):
    """Per-cluster spectral quality stats (operators/spectral.py
    clustering_score_frame) on the DETERMINISTIC clustering
    cluster = vertex % 4 — the spectral partition itself is
    seed-dependent (pytest-pinned on karate), but the score surface the
    reference exposes (analyzeClustering_modularity/edge_cut/ratio_cut,
    community/spectral_clustering.py:222-454) is exactly oracle-able:
    every column is an exact integer-valued sum or one final division."""
    g = _graph(spark, sf_dir)
    verts = g.unrenumber(g.vertices().withColumnRenamed("id", "vertex"), "vertex")
    cl = verts.select(
        "vertex", F.pmod(F.col("vertex"), F.lit(4)).cast("int").alias("cluster")
    )
    frame = clustering_score_frame(g, cl)
    return frame.select(
        F.col("cluster").cast("long"),
        F.col("n_vertices").cast("long"),
        (F.col("internal_2w") + F.lit(0.0)).alias("internal_2w"),
        (F.col("cut_w") + F.lit(0.0)).alias("cut_w"),
        (F.col("ratio_cut_term") + F.lit(0.0)).alias("ratio_cut_term"),
    )


def _q_clustering_modularity(spark, sf_dir):
    """Scalar clustering scores via the reference-parity helpers
    analyze_clustering_modularity / analyze_clustering_edge_cut on the
    same deterministic vertex%4 clustering.  Modularity is computed as a
    SINGLE division of exact integer sums ((Σin·2m − Σvol²)/(2m)²), so
    the float is bit-identical to the oracle's."""
    g = _graph(spark, sf_dir)
    verts = g.unrenumber(g.vertices().withColumnRenamed("id", "vertex"), "vertex")
    cl = verts.select(
        "vertex", F.pmod(F.col("vertex"), F.lit(4)).cast("int").alias("cluster")
    )
    q = analyze_clustering_modularity(g, 4, cl)
    cut = analyze_clustering_edge_cut(g, 4, cl)
    return spark.createDataFrame(
        [(4, float(q), float(cut))], "n_clusters long, modularity double, edge_cut double"
    )


def _q_lap_assignment(spark, sf_dir):
    """Hungarian assignment over a deterministic 6x6 bipartite cost graph
    (workers 0-5 → jobs 100-105, cost(i,j) = (7i² + 11j² + 13ij + 5i + 3j)
    mod 97 — a matrix with a verified-unique optimum, gap 12).  The oracle
    brute-forces all 720 permutations with a recursive CTE, so a green row
    certifies the O(n³) JV solve end-to-end, including the Spark bipartite
    block assembly and un/renumbering."""
    rows = [
        (i, 100 + j, float((7 * i * i + 11 * j * j + 13 * i * j + 5 * i + 3 * j) % 97))
        for i in range(6)
        for j in range(6)
    ]
    g = LinkGraph.from_edges(
        spark.createDataFrame(rows, "src LONG, dst LONG, weight DOUBLE"),
        weight="weight",
    )
    workers = spark.createDataFrame([(i,) for i in range(6)], "v LONG")
    total, df = hungarian(g, workers)
    return df.select(
        F.col("vertex").cast("long").alias("vertex"),
        F.col("assignment").cast("long").alias("assignment"),
        F.lit(float(total)).alias("total_cost"),
    )


def _q_fa2_attraction(spark, sf_dir):
    """Force Atlas 2 attraction gather at deterministic integer hash
    positions (operators/layout.py:attraction_at_hash_init).  Every value
    is an exact int64 sum over the symmetrized deduplicated neighbor set,
    so the row certifies the layout's attraction dataflow (symmetrize →
    dedup → gather → per-vertex fold) bit-for-bit; the float layout
    itself is seed-dependent and is pinned by tests/test_layout.py, the
    same split as spectral clustering."""
    g = _graph(spark, sf_dir)
    return attraction_at_hash_init(g).select(
        F.col("vertex").cast("long"),
        F.col("x0").cast("long"),
        F.col("y0").cast("long"),
        F.col("ax").cast("long"),
        F.col("ay").cast("long"),
    )


def _q_bipartite_sets(spark, sf_dir):
    """BiPartiteGraph partition bookkeeping (graph_classes.py): register
    the even vertices as the top set, let ``sets()`` derive the bottom as
    the distributed left-anti complement, and return every vertex labeled
    by side.  Exactly SQL-expressible (side = v % 2), so a green row
    certifies add_nodes_from → sets() → complement end-to-end."""
    g = BiPartiteGraph.from_edges(
        derived_edges(spark, sf_dir, num_vertices=K), directed=False
    )
    top_nodes = g.nodes().filter(F.col("vertex") % 2 == 0)
    g.add_nodes_from(top_nodes, bipartite="top")
    top, bottom = g.sets()
    return (
        top.select(F.col("vertex").cast("long"), F.lit(0).cast("int").alias("side"))
        .unionByName(
            bottom.select(
                F.col("vertex").cast("long"), F.lit(1).cast("int").alias("side")
            )
        )
    )


def _q_corpus_clean(spark, sf_dir):
    """Composed training-data cleaning pipeline (text.py:clean_corpus):
    exact-dedup survivors → language ID → quality ≥ 0.5 gate →
    per-language rollup.  Each stage has its own driver query; this row
    certifies their COMPOSITION (and the integer-micro-unit avg_quality)."""
    return tx.clean_corpus(_docs(spark, sf_dir), min_quality=0.5).select(
        "pred_lang",
        F.col("n_docs").cast("long"),
        F.col("total_tokens").cast("long"),
        "avg_quality",
    )


def _q_dedup_cluster(spark, sf_dir):
    """Near-dup clustering (text.py:near_dup_clusters): verified MinHash
    pairs → WCC over the pair graph → min-doc_id canonical per cluster.
    Certifies the graph×text composition a training-data dedup pipeline
    ships (transitive closure of near-duplication, canonical election)."""
    return tx.near_dup_clusters(_docs(spark, sf_dir), threshold=0.5).select(
        F.col("doc_id").cast("long"),
        F.col("canonical_id").cast("long"),
        F.col("cluster_size").cast("long"),
    )


def _q_gnn_sample(spark, sf_dir):
    """Batched uniform neighbor sampling (gnn.py — the sampling call the
    reference BulkSampler drives, bulk_sampler.py:262-273). Seeds = every
    vertex ≡ 3 (mod 29), batch = vertex mod 4, fanouts [3, 2]. With
    ``deterministic=True`` the per-(batch, source) selection ranks
    neighbors by an affine modular permutation of the id, so the exact
    sampled edge set is reproducible in ANSI SQL."""
    from cugraph_spark import gnn as gnnmod

    g = _graph(spark, sf_dir, directed=True, renumber=False)
    seeds = (
        g.vertices()
        .filter((F.col("id") % 29) == 3)
        .select(F.col("id").alias("start"), (F.col("id") % 4).alias("batch"))
    )
    out = gnnmod.uniform_neighbor_sample_batched(
        g, seeds, [3, 2], seed=11, deterministic=True, unrenumber=False,
        rank_modulus=K,
    )
    return out.select(
        F.col("batch_id").cast("long"),
        F.col("hop_id").cast("long"),
        F.col("sources").cast("long"),
        F.col("destinations").cast("long"),
    )


def _q_walk_paths(spark, sf_dir):
    """Deterministic random walks (operators/sampling.py `random_walks`
    with `deterministic=True`): starts = every vertex ≡ 1 (mod 37),
    max_depth 4. Each step's next hop is the argmin of the per-step
    affine modular permutation of the neighbor id (gnn.py
    `rank_constants`), so the full path set is a pure function of
    (edges, starts, seed) — reproducible in ANSI SQL. Walks stop early
    at sink vertices (no out-edges), exactly as the reference's
    variable path_sizes do."""
    from cugraph_spark.operators import random_walks as _rw

    g = _graph(spark, sf_dir, directed=True, renumber=False)
    starts = g.vertices().filter((F.col("id") % 37) == 1).select("id")
    out = _rw(
        g, starts, max_depth=WALK_DEPTH, seed=WALK_SEED, unrenumber=False,
        deterministic=True, rank_modulus=K,
    )
    return out.select(
        F.col("walk_id").cast("long"),
        F.col("step").cast("long"),
        F.col("vertex").cast("long"),
    )


def _q_und_edges(spark, sf_dir):
    """to_undirected conversion (graph.py, reference
    ``graph_classes.py`` Graph.to_undirected): rebuild the directed
    derived graph as undirected (symmetrize + dedup) and return its
    external-id edge list — must equal the relational union of both edge
    directions."""
    g = _graph(spark, sf_dir, directed=True, renumber=False).to_undirected()
    return g.view_edge_list().select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )


def _q_reachable(spark, sf_dir):
    """filter_unreachable (operators/traversal.py, reference
    ``sssp.py:264-291``): left-join the SSSP result onto the full vertex
    set with an Infinity sentinel for unreached vertices, then strip the
    sentinels — the surviving rows must equal the plain recursive-walk
    distances."""
    from cugraph_spark.operators import filter_unreachable as _fu

    g = _graph(spark, sf_dir, renumber=False)
    d = sssp(g, 1)
    full = (
        g.vertices()
        .select(F.col("id").alias("vertex"))
        .join(d, "vertex", "left")
        .withColumn(
            "distance",
            F.coalesce(F.col("distance"), F.lit(float("inf"))),
        )
    )
    return _fu(full).select(
        F.col("vertex").cast("long"), F.col("distance").cast("double")
    )


def _q_hypergraph_edges(spark, sf_dir):
    """Hypergraph builder (property_graph.py `hypergraph`, reference
    ``structure/hypergraph.py:42-288``): rows of a plain table become
    row-nodes, each connected to one value-node per (column, value).
    Row ids are the deterministic content-order rank from
    ``assign_dense_ids`` (range-partitioned prefix sums), so the string
    edge list is exactly reproducible in SQL. Input: events rows with
    event_id ≡ 5 (mod 101), columns (user_id, event_type); NULL-bearing
    rows excluded up front so both engines rank the identical row set."""
    from cugraph_spark.property_graph import hypergraph as _hg

    df = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(
            ((F.col("event_id") % 101) == 5)
            & F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select("user_id", "event_type")
    )
    out = _hg(df, columns=["user_id", "event_type"])
    return out["edges"].select("src", "dst")


def _q_pg_subgraph(spark, sf_dir):
    """PropertyGraph select→extract pipeline (property_graph.py, reference
    ``structure/property_graph.py:1494-1740``): customer rows as typed
    vertex data, orders rows as typed 'placed' edges
    (o_custkey → o_orderkey) carrying o_totalprice; ``select_edges`` with
    a SQL predicate then ``extract_subgraph`` builds a directed LinkGraph,
    whose external-id edge list must equal the bare SQL filter."""
    from cugraph_spark.property_graph import PropertyGraph as PG

    pg = PG(spark)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    pg.add_vertex_data(cust, vertex_col_name="c_custkey", type_name="customer")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    pg.add_edge_data(
        orders, vertex_col_names=("o_custkey", "o_orderkey"), type_name="placed"
    )
    sel = pg.select_edges("o_totalprice > 150000 AND _TYPE_ = 'placed'")
    g = pg.extract_subgraph(selection=sel, create_using={"directed": True})
    return g.view_edge_list().select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    )


def _q_stream_user_totals_multi(spark, sf_dir):
    """Multi-batch streaming driver query: the events table is staged as 3
    chronological file drops and replayed with ``maxFilesPerTrigger=1`` —
    3 micro-batches — through the applyInPandasWithState running-totals
    operator in update mode.  Per key: the LAST emission carries the final
    running totals (state carried across batches), and the NUMBER of
    emissions equals the number of drops the key appears in.  The oracle
    reconstructs both from the deterministic NTILE tiling, so a green row
    certifies cross-batch state carry, not merely batch≡stream on one
    drop."""
    global _STREAM_SINK_N
    _STREAM_SINK_N += 1
    drops = st.stage_chronological_drops(
        spark, f"{sf_dir}/events.parquet", n_drops=3
    )
    sdf = st.stateful_totals(
        st.stream_events(spark, drops, max_files_per_trigger=1)
    )
    out = st.run_available_now(
        sdf, f"t_entry_user_totals_multi_{_STREAM_SINK_N}", output_mode="update"
    )
    # n_events is strictly increasing across a key's emissions, so
    # max(n_events) is the final total and max_by(sum_value, n_events) the
    # final sum; count(*) is the per-key emission count.
    return out.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.max("n_events").cast("long").alias("n_events"),
        (F.max_by("sum_value", "n_events") + F.lit(0.0)).alias("sum_value"),
        F.count("*").cast("long").alias("n_emissions"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "graph_degrees": _q_degrees,
        "pagerank": _q_pagerank,
        "pagerank_csr": _q_pagerank_csr,
        "wcc": _q_wcc,
        "lpa": _q_lpa,
        "triangle_counts": _q_triangles,
        "bfs": _q_bfs,
        "sssp": _q_sssp,
        "two_hop": _q_two_hop,
        "jaccard": _q_jaccard,
        "overlap": _q_overlap,
        "sorensen": _q_sorensen,
        "degree_centrality": _q_degree_centrality,
        "hits": _q_hits,
        "hits_nstart": _q_hits_nstart,
        "triangles_start": _q_triangles_start,
        "katz": _q_katz,
        "eigenvector": _q_eigenvector,
        "core_number": _q_core_number,
        "induced_subgraph": _q_induced_subgraph,
        "ego_graph": _q_ego_graph,
        "scc": _q_scc,
        "ktruss": _q_ktruss,
        "louvain": _q_louvain,
        "leiden": _q_leiden,
        "ecg": _q_ecg,
        "mst_summary": _q_mst_summary,
        "bicliques": _q_bicliques,
        "traversed_cost": _q_traversed_cost,
        "betweenness": _q_betweenness,
        "edge_betweenness": _q_edge_betweenness,
        "pagerank_personalized": _q_pagerank_personalized,
        "wjaccard": _q_wjaccard,
        "woverlap": _q_woverlap,
        "wsorensen": _q_wsorensen,
        "batched_ego": _q_batched_ego,
        "dedup_exact": _q_dedup_exact,
        "doc_stats": _q_doc_stats,
        "lang_id": _q_lang_id,
        "token_rollup": _q_token_rollup,
        "doc_fingerprint": _q_fingerprint,
        "simhash": _q_simhash,
        "minhash_near_dup": _q_minhash_near_dup,
        "embedding_topk": _q_embedding_topk,
        "embedding_lsh_topk": _q_embedding_lsh_topk,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_ivf_topk": _q_ivf_topk,
        "stream_user_totals": _q_stream_user_totals,
        "stream_user_totals_multi": _q_stream_user_totals_multi,
        "stream_window_rollup": _q_stream_window_rollup,
        "clustering_scores": _q_clustering_scores,
        "clustering_modularity": _q_clustering_modularity,
        "image_stats": _q_image_stats,
        "audio_stats": _q_audio_stats,
        "video_stats": _q_video_stats,
        "lap_assignment": _q_lap_assignment,
        "fa2_attraction": _q_fa2_attraction,
        "bipartite_sets": _q_bipartite_sets,
        "corpus_clean": _q_corpus_clean,
        "dedup_cluster": _q_dedup_cluster,
        "gnn_sample": _q_gnn_sample,
        "walk_paths": _q_walk_paths,
        "hypergraph_edges": _q_hypergraph_edges,
        "pg_subgraph": _q_pg_subgraph,
        "und_edges": _q_und_edges,
        "reachable": _q_reachable,
    }


# -------------------------------------------------------------- oracle SQL
_EDGES = (
    f"SELECT DISTINCT CAST(l_orderkey % {K} AS BIGINT) AS src, "
    f"CAST(l_partkey % {K} AS BIGINT) AS dst FROM lineitem "
    f"WHERE (l_orderkey % {K}) != (l_partkey % {K})"
)
# explicit DISTINCT over UNION ALL: inside a WITH RECURSIVE block DuckDB
# does not deduplicate a plain UNION in non-recursive CTEs
_VERTS = (
    "SELECT DISTINCT v FROM "
    "(SELECT src AS v FROM edges UNION ALL SELECT dst AS v FROM edges)"
)
_SYM = "SELECT src, dst FROM edges UNION SELECT dst, src FROM edges"


def _sql_degrees() -> str:
    return f"""
WITH edges AS ({_EDGES}), verts AS ({_VERTS})
SELECT CAST(verts.v AS BIGINT) AS vertex,
       CAST(COALESCE(i.c, 0) AS BIGINT) AS in_degree,
       CAST(COALESCE(o.c, 0) AS BIGINT) AS out_degree
FROM verts
LEFT JOIN (SELECT dst, COUNT(*) c FROM edges GROUP BY dst) i ON i.dst = verts.v
LEFT JOIN (SELECT src, COUNT(*) c FROM edges GROUP BY src) o ON o.src = verts.v
"""


def _sql_pagerank(iters: int = PR_ITERS, alpha: float = 0.85) -> str:
    # every iterative CTE is MATERIALIZED — DuckDB inlines plain CTEs, and
    # r{i+1} references r{i} via d{i} and g{i}, which would otherwise expand
    # the plan tree exponentially (3^iters copies of r0)
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), verts AS MATERIALIZED ({_VERTS}),",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) n FROM verts),",
        "outw AS MATERIALIZED (SELECT verts.v, CAST(COALESCE(o.c,0) AS DOUBLE) ow FROM verts "
        "LEFT JOIN (SELECT src, COUNT(*) c FROM edges GROUP BY src) o ON o.src = verts.v),",
        "r0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nv) AS rank FROM verts),",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank),0) dm FROM r{i} r "
            f"JOIN outw o ON o.v = r.v WHERE o.ow = 0),"
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT e.dst v, SUM(r.rank/o.ow) gather FROM edges e "
            f"JOIN r{i} r ON r.v = e.src JOIN outw o ON o.v = e.src "
            f"WHERE o.ow > 0 GROUP BY e.dst),"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT verts.v, {alpha}*COALESCE(g.gather,0) + "
            f"({alpha}*(SELECT dm FROM d{i}) + {1.0 - alpha})/(SELECT n FROM nv) AS rank "
            f"FROM verts LEFT JOIN g{i} g ON g.v = verts.v),"
        )
    parts.append(
        f"fin AS (SELECT * FROM r{iters}) "
        "SELECT CAST(v AS BIGINT) AS vertex, ROUND(rank, 6) AS pagerank FROM fin"
    )
    return "\n".join(parts)


def _sql_pagerank_personalized(iters: int = PR_ITERS, alpha: float = 0.85) -> str:
    """Same MATERIALIZED-CTE scheme as ``_sql_pagerank`` with the
    personalization arm (``pagerank_impl.cuh:298-318``): the constant term
    ``(α·dangling + (1−α))`` is distributed ∝ p_v/Σp instead of 1/V."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), verts AS MATERIALIZED ({_VERTS}),",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) n FROM verts),",
        "outw AS MATERIALIZED (SELECT verts.v, CAST(COALESCE(o.c,0) AS DOUBLE) ow FROM verts "
        "LEFT JOIN (SELECT src, COUNT(*) c FROM edges GROUP BY src) o ON o.src = verts.v),",
        "p AS MATERIALIZED (SELECT v FROM verts WHERE v % 20 = 0),",
        "pn AS MATERIALIZED (SELECT v, 1.0 / (SELECT COUNT(*) FROM p) AS pn FROM p),",
        "r0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nv) AS rank FROM verts),",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT COALESCE(SUM(r.rank),0) dm FROM r{i} r "
            f"JOIN outw o ON o.v = r.v WHERE o.ow = 0),"
        )
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT e.dst v, SUM(r.rank/o.ow) gather FROM edges e "
            f"JOIN r{i} r ON r.v = e.src JOIN outw o ON o.v = e.src "
            f"WHERE o.ow > 0 GROUP BY e.dst),"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT verts.v, {alpha}*COALESCE(g.gather,0) + "
            f"({alpha}*(SELECT dm FROM d{i}) + {1.0 - alpha}) * COALESCE(pn.pn, 0) AS rank "
            f"FROM verts LEFT JOIN g{i} g ON g.v = verts.v "
            f"LEFT JOIN pn ON pn.v = verts.v),"
        )
    parts.append(
        f"fin AS (SELECT * FROM r{iters}) "
        "SELECT CAST(v AS BIGINT) AS vertex, ROUND(rank, 6) AS pagerank FROM fin"
    )
    return "\n".join(parts)


def _sql_weighted_pair(expr: str, alias: str) -> str:
    """Weighted similarity oracle: per-vertex weights 1 + (v % 7), neighbor
    volumes and Σ-min-free intersection sums exactly as
    ``similarity._weighted_pair_stats`` computes them."""
    return f"""
WITH edges AS ({_EDGES}),
sym AS (SELECT DISTINCT src, dst FROM ({_SYM}) WHERE src != dst),
w AS (SELECT v, 1.0 + (v % 7) AS wt FROM ({_VERTS})),
nbrw AS (SELECT s.src, s.dst, w.wt FROM sym s JOIN w ON w.v = s.dst),
vol AS (SELECT src v, SUM(wt) vol FROM nbrw GROUP BY src),
inter AS (SELECT a.src fa, b.src fb, SUM(a.wt) isect FROM nbrw a
          JOIN nbrw b ON a.dst = b.dst AND a.src < b.src GROUP BY a.src, b.src)
SELECT CAST(fa AS BIGINT) AS first, CAST(fb AS BIGINT) AS second,
       ROUND({expr}, 6) AS {alias}
FROM inter JOIN vol va ON va.v = fa JOIN vol vb ON vb.v = fb
"""


def _sql_batched_ego() -> str:
    return f"""
WITH edges AS ({_EDGES}),
sym AS ({_SYM}),
seeds AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS seed),
n1 AS (SELECT s.seed, y.dst AS v FROM seeds s JOIN sym y ON y.src = s.seed),
keep AS (SELECT seed, seed AS v FROM seeds UNION SELECT seed, v FROM n1)
SELECT CAST(e_seed AS BIGINT) AS seed, CAST(src AS BIGINT) AS src,
       CAST(dst AS BIGINT) AS dst
FROM (SELECT a.seed AS e_seed, e.src, e.dst
      FROM edges e JOIN keep a ON e.src = a.v JOIN keep b
        ON e.dst = b.v AND b.seed = a.seed)
"""


def _sql_embedding_lsh_topk(
    k: int = 5, n_planes: int = 64, n_bands: int = 8, probe_bits: int = 2
) -> str:
    """Exact SQL mirror of :func:`cugraph_spark.vector.lsh_topk` — the
    signature math is INTEGER (quantized components, modular ±1 signs), so
    the bucket assignment is bit-identical across engines; candidates,
    cosines, rounding and ranking then replay the Spark plan (including the
    weight-≤probe_bits multi-probe mask set, from the same generator)."""
    rows = n_planes // n_bands
    flips = vec.probe_masks(rows, probe_bits)
    q = vec.QUANT
    a1, b1 = 1299721, 15485863
    a2, b2 = 48271, 11
    p = vec.P
    return f"""
WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
comp AS (SELECT id, generate_subscripts(v, 1) - 1 AS j,
                CAST(ROUND(unnest(v) * {q}) AS BIGINT) AS xq,
                len(v) AS dim
         FROM base),
proj AS (SELECT id, t.pi AS pi,
                SUM(CASE WHEN (({a2} * (({a1} * (t.pi * dim + j) + {b1}) % {p})
                               + {b2}) % {p}) % 2 = 1
                    THEN xq ELSE -xq END) AS dot
         FROM comp CROSS JOIN range({n_planes}) t(pi)
         GROUP BY id, t.pi),
bk AS (SELECT id, CAST(pi // {rows} AS INT) AS band,
              SUM(CASE WHEN dot > 0
                  THEN CAST(POWER(2, pi % {rows}) AS BIGINT) ELSE 0 END) AS bkey
       FROM proj GROUP BY id, pi // {rows}),
probes AS (SELECT id, band, xor(bkey, f.f) AS bkey
           FROM bk CROSS JOIN (SELECT CAST(unnest({flips}) AS BIGINT) AS f) f),
cand AS (SELECT DISTINCT l.id AS query_id, r.id AS neighbor_id
         FROM probes l JOIN bk r ON r.band = l.band AND r.bkey = l.bkey
         WHERE l.id != r.id),
n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base),
sims AS (SELECT c.query_id, c.neighbor_id,
    ROUND(list_dot_product(q.v, t.v) / (q.nrm * t.nrm), 4) + 0.0 AS cosine
  FROM cand c JOIN n q ON q.id = c.query_id JOIN n t ON t.id = c.neighbor_id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
FROM sims
QUALIFY rank <= {k}
"""


def _sql_embedding_neardup(
    threshold: float = 0.4,
    n_planes: int = 64,
    n_bands: int = 8,
    probe_bits: int = 1,
) -> str:
    """Exact SQL mirror of :func:`cugraph_spark.vector.embedding_neardup`
    — same integer band keys as the lsh_topk oracle, one-sided Hamming-≤1
    probe on the vec_a side, pair order a < b, exact rounded cosine at the
    threshold."""
    rows = n_planes // n_bands
    flips = vec.probe_masks(rows, probe_bits)
    q = vec.QUANT
    a1, b1 = 1299721, 15485863
    a2, b2 = 48271, 11
    p = vec.P
    return f"""
WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
comp AS (SELECT id, generate_subscripts(v, 1) - 1 AS j,
                CAST(ROUND(unnest(v) * {q}) AS BIGINT) AS xq,
                len(v) AS dim
         FROM base),
proj AS (SELECT id, t.pi AS pi,
                SUM(CASE WHEN (({a2} * (({a1} * (t.pi * dim + j) + {b1}) % {p})
                               + {b2}) % {p}) % 2 = 1
                    THEN xq ELSE -xq END) AS dot
         FROM comp CROSS JOIN range({n_planes}) t(pi)
         GROUP BY id, t.pi),
bk AS (SELECT id, CAST(pi // {rows} AS INT) AS band,
              SUM(CASE WHEN dot > 0
                  THEN CAST(POWER(2, pi % {rows}) AS BIGINT) ELSE 0 END) AS bkey
       FROM proj GROUP BY id, pi // {rows}),
probes AS (SELECT id, band, xor(bkey, f.f) AS bkey
           FROM bk CROSS JOIN (SELECT CAST(unnest({flips}) AS BIGINT) AS f) f),
cand AS (SELECT DISTINCT l.id AS vec_a, r.id AS vec_b
         FROM probes l JOIN bk r ON r.band = l.band AND r.bkey = l.bkey
         WHERE l.id < r.id),
n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base)
SELECT CAST(c.vec_a AS BIGINT) AS vec_a,
       CAST(c.vec_b AS BIGINT) AS vec_b,
       ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) + 0.0 AS cosine
FROM cand c JOIN n a ON a.id = c.vec_a JOIN n b ON b.id = c.vec_b
WHERE ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) >= {threshold}
"""


def _sql_ivf_topk(
    k: int = 5, n_cells: int = 16, n_probe: int = 4
) -> str:
    """Exact SQL mirror of :func:`cugraph_spark.vector.ivf_topk` — the
    coarse quantizer is deterministic by construction (hash-ordered seeds,
    integer-quantized dots, floor-mean Lloyd step), so seeds, both
    assignment argmaxes, probes, candidates and final ranks replay
    bit-identically."""
    q = vec.QUANT
    a, b = vec.IVF_A, vec.IVF_B
    p = vec.P
    return f"""
WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
qv AS (SELECT id, list_transform(v, x -> CAST(ROUND(x * {q}) AS DOUBLE)) AS xq
       FROM base),
seeds AS (SELECT id, xq, ({a} * id + {b}) % {p} AS h
          FROM qv ORDER BY h, id LIMIT {n_cells}),
seedc AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, id) - 1 AS INT) AS cell,
                 xq AS cq
          FROM seeds),
s0 AS (SELECT qv.id, c.cell,
              ROUND(list_dot_product(qv.xq, c.cq)
                    / sqrt(list_dot_product(c.cq, c.cq)), 4) AS s
       FROM qv CROSS JOIN seedc c),
a0 AS (SELECT id, cell FROM (
         SELECT id, cell,
                ROW_NUMBER() OVER (PARTITION BY id
                                   ORDER BY s DESC, cell ASC) AS rn
         FROM s0) WHERE rn = 1),
xs AS (SELECT id, generate_subscripts(xq, 1) - 1 AS j, unnest(xq) AS x
       FROM qv),
compc AS (SELECT a0.cell, xs.j, SUM(xs.x) AS cs, COUNT(*) AS cn
          FROM xs JOIN a0 ON a0.id = xs.id GROUP BY a0.cell, xs.j),
cent AS (SELECT cell,
                list((cs - (((cs % cn) + cn) % cn)) / cn ORDER BY j) AS cq
         FROM compc GROUP BY cell),
s1 AS (SELECT qv.id, c.cell,
              ROUND(list_dot_product(qv.xq, c.cq)
                    / sqrt(list_dot_product(c.cq, c.cq)), 4) AS s
       FROM qv CROSS JOIN cent c),
assign AS (SELECT id, cell FROM (
             SELECT id, cell,
                    ROW_NUMBER() OVER (PARTITION BY id
                                       ORDER BY s DESC, cell ASC) AS rn
             FROM s1) WHERE rn = 1),
probes AS (SELECT id AS query_id, cell FROM (
             SELECT id, cell,
                    ROW_NUMBER() OVER (PARTITION BY id
                                       ORDER BY s DESC, cell ASC) AS rn
             FROM s1) WHERE rn <= {n_probe}),
cand AS (SELECT DISTINCT p.query_id, a.id AS neighbor_id
         FROM probes p JOIN assign a ON a.cell = p.cell
         WHERE p.query_id != a.id),
n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base),
sims AS (SELECT c.query_id, c.neighbor_id,
    ROUND(list_dot_product(qq.v, t.v) / (qq.nrm * t.nrm), 4) + 0.0 AS cosine
  FROM cand c JOIN n qq ON qq.id = c.query_id JOIN n t ON t.id = c.neighbor_id)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
FROM sims
QUALIFY rank <= {k}
"""


def _sql_stream_window_rollup() -> str:
    """Epoch-aligned 1-hour tumbling windows (Spark's F.window buckets
    from the 1970 epoch) + the same micro-unit exact sum."""
    return """
SELECT CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT) AS win_epoch,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(CAST(ROUND(value * 1000000) AS BIGINT)) / 1000000.0 AS sum_value
FROM events GROUP BY 1, 2
"""


def _sql_image_stats(n: int = 64, w: int = 16, h: int = 16) -> str:
    """Pixel-law mirror of the decoded gradient images: per-asset channel
    means (Σv/256, exact) and dark fraction (count/768, exact)."""
    npx = w * h * 3
    per_ch = w * h
    return f"""
WITH px AS (
  SELECT a.asset_id, i.i,
         CAST((7 * a.asset_id + i.i) % 256 AS DOUBLE) AS v
  FROM range(0, {n}) a(asset_id) CROSS JOIN range(0, {npx}) i(i))
SELECT CAST(asset_id AS BIGINT) AS asset_id,
       SUM(CASE WHEN i % 3 = 0 THEN v END) / {per_ch}.0 AS mean_r,
       SUM(CASE WHEN i % 3 = 1 THEN v END) / {per_ch}.0 AS mean_g,
       SUM(CASE WHEN i % 3 = 2 THEN v END) / {per_ch}.0 AS mean_b,
       SUM(CASE WHEN v < 128 THEN 1 ELSE 0 END) / {npx}.0 AS dark_frac
FROM px GROUP BY asset_id
"""


def _sql_audio_stats(n: int = 32, sr: int = 16000, m: int = 2048) -> str:
    """Sample-law mirror of the decoded chirp WAVs: zero-crossings use the
    closed form of the NEXT sample (no window function), all accumulations
    are exact integers, each output one IEEE division (+sqrt for rms)."""
    return f"""
WITH s AS (
  SELECT a.asset_id, i.i,
         CAST((137*a.asset_id + 31*i.i) % {4001} - 2000 AS BIGINT) AS v,
         CAST((137*a.asset_id + 31*(i.i+1)) % {4001} - 2000 AS BIGINT) AS vn
  FROM range(0, {n}) a(asset_id) CROSS JOIN range(0, {m}) i(i))
SELECT CAST(asset_id AS BIGINT) AS asset_id,
       CAST({sr} AS BIGINT) AS sample_rate,
       CAST({m} AS BIGINT) AS n_samples,
       {m} / {sr}.0 AS duration_sec,
       SQRT(SUM(v*v) / {m}.0) AS rms,
       SUM(CASE WHEN i < {m - 1} AND v * vn < 0 THEN 1 ELSE 0 END) / {m - 1}.0 AS zcr,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak
FROM s GROUP BY asset_id
"""


def _sql_video_stats(
    n: int = 16, w: int = 16, h: int = 16, nf: int = 24, fps: int = 25
) -> str:
    """Luma-law mirror of the decoded Y4M checker videos: motion uses the
    closed form of the NEXT frame's pixel (no window function), all sums
    exact integers, one IEEE division per output."""
    npx = w * h
    return f"""
WITH px AS (
  SELECT a.asset_id, f.f,
         CAST((11*a.asset_id + 5*f.f + 3*p.p) % 251 AS BIGINT) AS v,
         CAST((11*a.asset_id + 5*(f.f+1) + 3*p.p) % 251 AS BIGINT) AS vn
  FROM range(0, {n}) a(asset_id)
  CROSS JOIN range(0, {nf}) f(f) CROSS JOIN range(0, {npx}) p(p))
SELECT CAST(asset_id AS BIGINT) AS asset_id,
       CAST({w} AS BIGINT) AS width,
       CAST({h} AS BIGINT) AS height,
       CAST({nf} AS BIGINT) AS n_frames,
       {nf} / {fps}.0 AS duration_sec,
       SUM(v) / {nf * npx}.0 AS mean_luma,
       CAST(MAX(v) AS BIGINT) AS max_luma,
       SUM(CASE WHEN f < {nf - 1} THEN ABS(vn - v) ELSE 0 END)
         / {(nf - 1) * npx}.0 AS motion
FROM px GROUP BY asset_id
"""


_CLUSTER_SIDES = """
und AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
               CAST(COUNT(*) AS DOUBLE) AS w
        FROM edges GROUP BY 1, 2),
cl AS (SELECT v, v % 4 AS c FROM verts),
sides AS (
  SELECT ca.c AS cluster, cb.c AS other, u.w
  FROM und u JOIN cl ca ON ca.v = u.a JOIN cl cb ON cb.v = u.b
  UNION ALL
  SELECT cb.c, ca.c, u.w
  FROM und u JOIN cl ca ON ca.v = u.a JOIN cl cb ON cb.v = u.b),
per AS (
  SELECT sz.c AS cluster, sz.n,
         COALESCE(st.i2w, 0) AS i2w, COALESCE(st.cw, 0) AS cw
  FROM (SELECT c, COUNT(*) AS n FROM cl GROUP BY c) sz
  LEFT JOIN (
    SELECT cluster,
           SUM(CASE WHEN cluster = other THEN w ELSE 0 END) AS i2w,
           SUM(CASE WHEN cluster <> other THEN w ELSE 0 END) AS cw
    FROM sides GROUP BY cluster) st ON st.cluster = sz.c)
"""


def _sql_clustering_scores() -> str:
    """Mirror of clustering_score_frame on the vertex%4 clustering: the
    undirected frame collapses directed pairs with summed unit weights
    (graph is loop-free by construction); every output is an exact integer
    sum or one division."""
    return f"""
WITH edges AS ({_EDGES}), verts AS ({_VERTS}),
{_CLUSTER_SIDES}
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(n AS BIGINT) AS n_vertices,
       i2w + 0.0 AS internal_2w,
       cw + 0.0 AS cut_w,
       cw / n AS ratio_cut_term
FROM per
"""


def _sql_clustering_modularity() -> str:
    """Scalar mirror: Q = (Σin·2m − Σvol²)/(2m)² as one division of exact
    integer sums; edge_cut = Σcut/2."""
    return f"""
WITH edges AS ({_EDGES}), verts AS ({_VERTS}),
{_CLUSTER_SIDES}
SELECT CAST(4 AS BIGINT) AS n_clusters,
       (SUM(i2w) * SUM(i2w + cw) - SUM((i2w + cw) * (i2w + cw)))
         / (SUM(i2w + cw) * SUM(i2w + cw)) AS modularity,
       SUM(cw) / 2 + 0.0 AS edge_cut
FROM per
"""


def _sql_lap_assignment() -> str:
    """Exact oracle for the Hungarian driver query: brute-force all 6! = 720
    assignments with a recursive CTE and take the (unique) minimum.  Costs
    are small integers, so sums are exact in both engines; the cost matrix
    was verified to have a single optimum (gap 12), so the assignment rows
    are deterministic, not just the total."""
    return """
WITH RECURSIVE perm(assigned, k, cost) AS (
  SELECT CAST([] AS BIGINT[]), 0, CAST(0 AS BIGINT)
  UNION ALL
  SELECT list_append(assigned, j), k + 1,
         cost + (7*k*k + 11*j*j + 13*k*j + 5*k + 3*j) % 97
  FROM perm, (SELECT unnest(range(6)) AS j) js
  WHERE k < 6 AND NOT list_contains(assigned, j)
),
best AS (SELECT assigned, cost FROM perm WHERE k = 6 ORDER BY cost, assigned LIMIT 1)
SELECT CAST(i AS BIGINT) AS vertex,
       CAST(100 + assigned[CAST(i AS INT) + 1] AS BIGINT) AS assignment,
       CAST(cost AS DOUBLE) AS total_cost
FROM best, (SELECT unnest(range(6)) AS i) isel
ORDER BY vertex
"""


def _sql_fa2_attraction() -> str:
    """Exact oracle for the FA2 attraction gather: integer hash positions
    over external ids, lin attraction = Σ (pos_v − pos_u) over the
    symmetrized deduplicated neighbor set.  All int64 arithmetic — the
    sums are order-independent, so the hash comparison is exact."""
    return f"""
WITH edges AS ({_EDGES}), verts AS ({_VERTS}),
sym AS ({_SYM}),
pos AS (
  SELECT v,
         (48611 * (v + 7919) + 102953) % 1000003 AS x0,
         (102953 * (v + 7919) + 48611) % 1000003 AS y0
  FROM verts
),
g AS (
  SELECT sym.src AS u,
         SUM(p.x0) AS sx, SUM(p.y0) AS sy, COUNT(*) AS nd
  FROM sym JOIN pos p ON p.v = sym.dst
  GROUP BY sym.src
)
SELECT CAST(verts.v AS BIGINT) AS vertex,
       CAST(p.x0 AS BIGINT) AS x0,
       CAST(p.y0 AS BIGINT) AS y0,
       CAST(COALESCE(g.sx - g.nd * p.x0, 0) AS BIGINT) AS ax,
       CAST(COALESCE(g.sy - g.nd * p.y0, 0) AS BIGINT) AS ay
FROM verts JOIN pos p ON p.v = verts.v
LEFT JOIN g ON g.u = verts.v
"""


def _sql_dedup_cluster(threshold: float = 0.5) -> str:
    """Exact oracle for near-dup clustering: the full minhash pipeline
    (same CTE chain as _sql_minhash_near_dup) as a subquery, then a
    recursive-CTE component closure over the verified pair graph and a
    min-doc_id canonical election — mirror of text.py:near_dup_clusters."""
    inner = _sql_minhash_near_dup(threshold)
    return f"""
WITH RECURSIVE pairs AS (SELECT doc_a, doc_b FROM ({inner})),
symp AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         UNION SELECT doc_b, doc_a FROM pairs),
members AS (SELECT DISTINCT s AS v FROM symp),
reach(v, u) AS (
  SELECT v, v FROM members
  UNION
  SELECT r.v, s.d FROM reach r JOIN symp s ON s.s = r.u
),
comp AS (SELECT v, MIN(u) AS canon FROM reach GROUP BY v),
sizes AS (SELECT canon, COUNT(*) AS csize FROM comp GROUP BY canon)
SELECT CAST(comp.v AS BIGINT) AS doc_id,
       CAST(canon AS BIGINT) AS canonical_id,
       CAST(csize AS BIGINT) AS cluster_size
FROM comp JOIN sizes USING (canon)
"""


def _sql_corpus_clean(min_quality: float = 0.5) -> str:
    """Exact oracle for the composed cleaning pipeline.  Dedup groups on
    raw text (≡ the Spark side's 128-bit digest identity), the stats/lang
    expressions mirror _sql_doc_stats/_sql_lang_id, and avg_quality sums
    int64 micro-units so both engines divide the same exact integer."""
    stop = ", ".join(f"'{s}'" for s in tx.EN_STOP)
    score_cols = []
    for lang in tx._LANG_ORDER:
        markers = ", ".join(f"'{m}'" for m in tx.LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(string_split(text, ' '), x -> x IN ({markers}))) AS s_{lang}"
        )
    whens = "\n".join(
        f"    WHEN s_{lang} = best THEN '{lang}'" for lang in tx._LANG_ORDER
    )
    return f"""
WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text),
d AS (SELECT documents.doc_id, documents.text FROM documents JOIN keep USING (doc_id)),
s AS (
  SELECT doc_id, text,
    len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
    length(text) AS n_chars,
    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
    len(list_filter(string_split(text, ' '), x -> x IN ({stop}))) AS stop_hits,
    {', '.join(score_cols)}
  FROM d
), q AS (
  SELECT *, ROUND(0.4 * LEAST(1.0, n_tokens / 100.0)
       + 0.3 * (1.0 - ROUND(CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1), 6))
       + 0.3 * ROUND(CAST(stop_hits AS DOUBLE) / GREATEST(n_tokens, 1), 6), 6) AS quality,
       GREATEST(s_en, s_de, s_fr, s_es, s_zh) AS best
  FROM s
), j AS (
  SELECT CASE WHEN best = 0 THEN 'unk'
{whens}
  END AS pred_lang, n_tokens, quality
  FROM q WHERE quality >= {min_quality}
)
SELECT pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND((CAST(SUM(CAST(ROUND(quality * 1000000) AS BIGINT)) AS DOUBLE)
              / COUNT(*)) / 1000000.0, 6) AS avg_quality
FROM j GROUP BY pred_lang
"""


def _sql_bipartite_sets() -> str:
    """Exact oracle for the BiPartiteGraph sets() query: every edge
    endpoint labeled side = v % 2 (top = even vertices, bottom = the
    complement the Spark side derives via left-anti join)."""
    return f"""
WITH edges AS ({_EDGES}), verts AS ({_VERTS})
SELECT CAST(v AS BIGINT) AS vertex, CAST(v % 2 AS INT) AS side FROM verts
"""


def _sql_stream_user_totals() -> str:
    """Batch oracle for the streaming stateful-totals query: one
    AvailableNow micro-batch over the whole table ≡ the batch aggregate.
    The sum mirrors the operator's integer-micro-unit state
    (streaming.py:_totals_fn): each event quantized to round(value·1e6),
    summed exactly as BIGINT, divided once — identical in any engine and
    any order."""
    return """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(CAST(ROUND(value * 1000000) AS BIGINT)) / 1000000.0 AS sum_value
FROM events GROUP BY user_id
"""


def _sql_stream_user_totals_multi(n_drops: int = 3) -> str:
    """Batch oracle for the MULTI-batch stateful-totals query.  The Spark
    side replays the events table as ``n_drops`` chronological file drops
    (NTILE(n) over (ts, event_id) — streaming.py:stage_chronological_drops)
    with maxFilesPerTrigger=1, so in update mode a key emits once per
    micro-batch it appears in.  ``n_emissions`` therefore must equal the
    number of distinct tiles containing the key — reproducing it in SQL is
    what proves the stream really ran >1 micro-batch with state carried
    across batches (a single-batch run would emit exactly once per key)."""
    return f"""
WITH tiled AS (
  SELECT user_id, value,
         NTILE({n_drops}) OVER (ORDER BY ts, event_id) AS b
  FROM events)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       SUM(CAST(ROUND(value * 1000000) AS BIGINT)) / 1000000.0 AS sum_value,
       CAST(COUNT(DISTINCT b) AS BIGINT) AS n_emissions
FROM tiled GROUP BY user_id
"""


def _sql_core_number(rounds: int = 24) -> str:
    """Iterated-H-index fixpoint oracle: starting from degree,
    ``c_{t+1}(v) = H-index of {c_t(u) : u ~ v}`` converges to the coreness
    (Lü et al. 2016, "The H-index of a network node and its relation to
    degree and coreness").  Coreness is a UNIQUE fixpoint, so the oracle
    need not mirror the Spark peel's order — any convergent method matches
    exactly.  ``rounds`` is unrolled (DuckDB 1.0 has no keyed recursion)
    and verified ≥ the sf0.01 fixture's convergence depth."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), "
        f"verts AS MATERIALIZED ({_VERTS}), "
        f"adj AS MATERIALIZED ({_SYM}), "
        "c0 AS MATERIALIZED (SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM adj GROUP BY src)"
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f""", c{t} AS MATERIALIZED (
  SELECT v, MAX(LEAST(rn, cv)) AS c FROM (
    SELECT a.src AS v, c.c AS cv,
           ROW_NUMBER() OVER (PARTITION BY a.src ORDER BY c.c DESC) AS rn
    FROM adj a JOIN c{t - 1} c ON c.v = a.dst) GROUP BY v)"""
        )
    parts.append(
        f"""
SELECT CAST(t.v AS BIGINT) AS vertex,
       CAST(COALESCE(f.c, 0) AS INT) AS core_number
FROM verts t LEFT JOIN c{rounds} f ON f.v = t.v"""
    )
    return "".join(parts)


def _sql_ktruss(k: int = 4, rounds: int = 8) -> str:
    """Iterated support-peel oracle: drop canonical edges with < k−2
    triangles, repeat.  The k-truss is the UNIQUE maximal fixpoint
    (peel order is irrelevant), so the unrolled rounds need not mirror the
    Spark (k−1)-core pre-peel; ``rounds`` verified ≥ the sf0.01 fixture's
    convergence depth (extra rounds are no-ops on the fixpoint)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), "
        "u0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, "
        "GREATEST(src, dst) AS b FROM edges)"
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        parts.append(
            f""", tri{t} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM u{p} e1 JOIN u{p} e2 ON e2.a = e1.b
  JOIN u{p} e3 ON e3.a = e1.a AND e3.b = e2.b),
sup{t} AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS s FROM (
    SELECT x AS a, y AS b FROM tri{t}
    UNION ALL SELECT y AS a, z AS b FROM tri{t}
    UNION ALL SELECT x AS a, z AS b FROM tri{t}) GROUP BY a, b),
u{t} AS MATERIALIZED (
  SELECT e.a, e.b FROM u{p} e JOIN sup{t} s ON s.a = e.a AND s.b = e.b
  WHERE s.s >= {k - 2})"""
        )
    parts.append(
        f"""
SELECT CAST(a AS BIGINT) AS src, CAST(b AS BIGINT) AS dst FROM u{rounds}"""
    )
    return "".join(parts)


def _sql_brandes(edge_form: bool, n_sources: int = 16, depth: int = 10) -> str:
    """Unrolled multi-source Brandes mirror of
    :mod:`cugraph_spark.operators.betweenness` — forward sigma-BFS per
    depth level, backward dependency accumulation per level, the per-edge
    term shared between the vertex and edge variants, and the reference's
    n/k + 1/((n−1)(n−2)) (vertex) or 1/(n(n−1)) (edge) scaling.  ``depth``
    is unrolled ≥ the fixture's max source eccentricity (deeper levels are
    empty frames, which cost nothing)."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), "
        f"verts AS MATERIALIZED ({_VERTS}), "
        f"srcs AS MATERIALIZED (SELECT CAST(t.range AS BIGINT) AS s "
        f"FROM range({n_sources}) t), "
        "l0 AS MATERIALIZED (SELECT s, s AS v, CAST(1.0 AS DOUBLE) AS sigma "
        "FROM srcs), "
        "seen0 AS MATERIALIZED (SELECT s, v FROM l0)"
    ]
    for d in range(1, depth + 1):
        p = d - 1
        parts.append(
            f""", l{d} AS MATERIALIZED (
  SELECT f.s, e.dst AS v, SUM(f.sigma) AS sigma
  FROM l{p} f JOIN edges e ON e.src = f.v
  WHERE NOT EXISTS (SELECT 1 FROM seen{p} sn
                    WHERE sn.s = f.s AND sn.v = e.dst)
  GROUP BY f.s, e.dst),
seen{d} AS MATERIALIZED (
  SELECT s, v FROM seen{p} UNION ALL SELECT s, v FROM l{d})"""
        )
    parts.append(
        f""", delta{depth} AS MATERIALIZED (
  SELECT s, v, CAST(0.0 AS DOUBLE) AS delta FROM l{depth} WHERE 1 = 0)"""
    )
    for d in range(depth - 1, -1, -1):
        w = d + 1
        parts.append(
            f""", terms{d} AS MATERIALIZED (
  SELECT ld.s, e.src, e.dst,
         ld.sigma / lw.sigma * (1.0 + COALESCE(dl.delta, 0.0)) AS term
  FROM edges e
  JOIN l{d} ld ON ld.v = e.src
  JOIN l{w} lw ON lw.s = ld.s AND lw.v = e.dst
  LEFT JOIN delta{w} dl ON dl.s = ld.s AND dl.v = e.dst),
delta{d} AS MATERIALIZED (
  SELECT s, src AS v, SUM(term) AS delta FROM terms{d} GROUP BY s, src)"""
        )
    nn = ", nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)"
    if edge_form:
        terms_union = " UNION ALL ".join(
            f"SELECT src, dst, term FROM terms{d}" for d in range(depth)
        )
        parts.append(nn)
        parts.append(
            f""", eacc AS (SELECT src, dst, SUM(term) AS bc
  FROM ({terms_union}) GROUP BY src, dst)
SELECT CAST(e.src AS BIGINT) AS src, CAST(e.dst AS BIGINT) AS dst,
       ROUND(COALESCE(a.bc, 0.0)
             * ((SELECT n FROM nn) / {n_sources}.0)
             / ((SELECT n FROM nn) * ((SELECT n FROM nn) - 1.0)), 6) + 0.0
         AS betweenness_centrality
FROM edges e LEFT JOIN eacc a ON a.src = e.src AND a.dst = e.dst"""
        )
    else:
        delta_union = " UNION ALL ".join(
            f"SELECT s, v, delta FROM delta{d}" for d in range(depth)
        )
        parts.append(nn)
        parts.append(
            f""", acc AS (SELECT v, SUM(delta) AS bc
  FROM ({delta_union}) WHERE s != v GROUP BY v)
SELECT CAST(t.v AS BIGINT) AS vertex,
       ROUND(COALESCE(a.bc, 0.0)
             * ((SELECT n FROM nn) / {n_sources}.0)
             / (((SELECT n FROM nn) - 1.0) * ((SELECT n FROM nn) - 2.0)), 6)
         + 0.0 AS betweenness_centrality
FROM verts t LEFT JOIN acc a ON a.v = t.v"""
        )
    return "".join(parts)


def _move_rounds(
    tag: str, both_cte: str, deg_cte: str, tm_cte: str, rounds: int, gamma: float
) -> tuple[list[str], str]:
    """Unrolled rounds of the engine's synchronous parity-alternated local
    moving (``louvain._local_move``) starting from CTE ``{tag}c0`` [i, c];
    returns (CTE parts, final community CTE name).  ``both_cte`` supplies
    the kic edge frame (the full frame for normal moving, the
    intra-community frame for Leiden refinement)."""
    parts = []
    for r in range(rounds):
        parts += [
            # k_{i,c}: weight from i into each neighbouring community
            f"{tag}k{r} AS MATERIALIZED (SELECT b.i, m.c, SUM(b.w) kic"
            f" FROM {both_cte} b JOIN {tag}c{r} m ON m.i = b.j GROUP BY b.i, m.c),",
            f"{tag}s{r} AS MATERIALIZED (SELECT m.c, SUM(d.k) sig"
            f" FROM {tag}c{r} m JOIN {deg_cte} d ON d.i = m.i GROUP BY m.c),",
            # candidates: neighbour communities plus staying put (kic=0)
            f"{tag}n{r} AS MATERIALIZED (SELECT i, c, MAX(kic) kic FROM ("
            f"SELECT i, c, kic FROM {tag}k{r}"
            f" UNION ALL SELECT i, c, CAST(0.0 AS DOUBLE) FROM {tag}c{r}"
            f") GROUP BY i, c),",
            f"{tag}p{r} AS MATERIALIZED (SELECT i, c AS new_c FROM ("
            f"SELECT n.i, n.c, ROW_NUMBER() OVER (PARTITION BY n.i ORDER BY"
            f" (n.kic - {gamma} * d.k *"
            f" (s.sig - CASE WHEN n.c = m.c THEN d.k ELSE 0.0 END)"
            f" / (SELECT tm FROM {tm_cte})) DESC, n.c ASC) rn"
            f" FROM {tag}n{r} n JOIN {tag}s{r} s ON s.c = n.c"
            f" JOIN {deg_cte} d ON d.i = n.i JOIN {tag}c{r} m ON m.i = n.i"
            f") WHERE rn = 1),",
            # parity alternation: only i % 2 == round % 2 may move
            f"{tag}c{r + 1} AS MATERIALIZED (SELECT m.i,"
            f" CASE WHEN m.i % 2 = {r % 2} THEN p.new_c ELSE m.c END AS c"
            f" FROM {tag}c{r} m JOIN {tag}p{r} p ON p.i = m.i),",
        ]
    return parts, f"{tag}c{rounds}"


def _level_frames(p: str, lv: int) -> list[str]:
    """Per-level both/deg/2m frames over edge CTE ``{p}e{lv}`` (canonical
    undirected [a, b, w]; self-loops from coarsening count twice in k)."""
    e = f"{p}e{lv}"
    return [
        f"{p}both{lv} AS MATERIALIZED (SELECT a i, b j, w FROM {e} WHERE a != b"
        f" UNION ALL SELECT b, a, w FROM {e} WHERE a != b),",
        f"{p}deg{lv} AS MATERIALIZED (SELECT i, SUM(wk) k FROM ("
        f"SELECT i, w wk FROM {p}both{lv}"
        f" UNION ALL SELECT a, 2 * w FROM {e} WHERE a = b) GROUP BY i),",
        f"{p}tm{lv} AS MATERIALIZED (SELECT SUM(k) tm FROM {p}deg{lv}),",
    ]


def _louvain_block(
    p: str, rounds: int, levels: int, gamma: float
) -> tuple[list[str], str]:
    """CTE block mirroring the engine's Louvain level loop (``_levels``)
    over a pre-existing canonical undirected edge CTE ``{p}e0``; returns
    (parts, final mapping CTE name) with mapping columns (orig, cur).

    The level-advance check (``n_comms < n_before``) is data-dependent and
    NOT idempotent under static unrolling (coarsening by a non-reducing
    bijection would relabel the graph), so each level's mapping composition
    is gated on a cumulative ``act`` flag mirroring the engine's break."""
    parts = [f"{p}act0 AS MATERIALIZED (SELECT TRUE AS act),"]
    for lv in range(levels):
        parts += _level_frames(p, lv)
        parts.append(
            f"{p}L{lv}c0 AS MATERIALIZED (SELECT i, i AS c FROM {p}deg{lv}),"
        )
        mv, fin = _move_rounds(
            f"{p}L{lv}", f"{p}both{lv}", f"{p}deg{lv}", f"{p}tm{lv}", rounds, gamma
        )
        parts += mv
        parts.append(
            f"{p}act{lv + 1} AS MATERIALIZED (SELECT (SELECT act FROM {p}act{lv})"
            f" AND (SELECT COUNT(DISTINCT c) FROM {fin})"
            f" < (SELECT COUNT(*) FROM {p}deg{lv}) AS act),"
        )
        if lv == 0:
            parts.append(
                f"{p}map0 AS MATERIALIZED (SELECT i AS orig, c AS cur FROM {fin}),"
            )
        else:
            parts.append(
                f"{p}map{lv} AS MATERIALIZED (SELECT m.orig,"
                f" CASE WHEN (SELECT act FROM {p}act{lv}) THEN c2.c ELSE m.cur END"
                f" AS cur FROM {p}map{lv - 1} m"
                f" LEFT JOIN {fin} c2 ON c2.i = m.cur),"
            )
        if lv < levels - 1:
            parts.append(
                f"{p}e{lv + 1} AS MATERIALIZED (SELECT LEAST(ca.c, cb.c) a,"
                f" GREATEST(ca.c, cb.c) b, SUM(w) w FROM {p}e{lv} e"
                f" JOIN {fin} ca ON ca.i = e.a"
                f" JOIN {fin} cb ON cb.i = e.b GROUP BY 1, 2),"
            )
    return parts, f"{p}map{levels - 1}"


_CANON_UND = (
    "SELECT LEAST(src, dst) a, GREATEST(src, dst) b,"
    " CAST(COUNT(*) AS DOUBLE) w FROM edges GROUP BY 1, 2"
)


def _sql_louvain(rounds: int = 10, levels: int = 3, gamma: float = 1.0) -> str:
    """Exact unrolled mirror of :mod:`cugraph_spark.operators.louvain`
    (synchronous parity-alternated local moving + coarsening).

    Why an exact mirror is possible: every weight in the fixture is an
    integer-valued double (edge multiplicities), so every SUM the engine
    computes (kic, degree, sigma, 2m, coarsened weights) is exact in
    binary64 regardless of summation order, and the modularity gain
    ``kic − γ·k·(Σtot − δ·k)/2m`` is a single multiply + divide on exact
    inputs — bit-identical between the JVM and DuckDB.  Ties therefore
    break identically (gain DESC, community id ASC).

    Control flow is unrolled statically, which is safe because the
    engine's early exits are idempotent fixpoints: a local-move round
    after two stable parities reproduces the same assignment, so running
    all ``rounds`` rounds matches any early exit; the non-idempotent
    level-advance break is mirrored by ``_louvain_block``'s act gates.
    """
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}),",
        f"ve0 AS MATERIALIZED ({_CANON_UND}),",
    ]
    blk, fmap = _louvain_block("v", rounds, levels, gamma)
    parts += blk
    parts.append(
        f"fin AS MATERIALIZED (SELECT orig AS v, cur AS p FROM {fmap}),"
        " canon AS MATERIALIZED (SELECT p, MIN(v) mc FROM fin GROUP BY p)"
        ' SELECT CAST(f.v AS BIGINT) AS vertex, CAST(c.mc AS BIGINT) AS "partition"'
        " FROM fin f JOIN canon c ON c.p = f.p"
    )
    return "\n".join(parts)


def _sql_leiden(rounds: int = 10, levels: int = 3, gamma: float = 1.0) -> str:
    """Exact unrolled mirror of :mod:`cugraph_spark.operators.leiden`:
    per level a SEEDED local move (previous level's coarse assignment),
    a REFINEMENT restart from singletons restricted to intra-community
    edges (same degree/2m frame, per the engine), piece canonicalization
    to min member id, then coarsening by the refined partition; finally
    the compound-move POLISH (Louvain level loop over the community graph
    of the original frame) with the better-of-two modularity gate.  Same
    exact-arithmetic argument as :func:`_sql_louvain`; the only inexact
    comparison is the final q_pol > q_orig gate, which only matters when
    the two partitions differ, where Q gaps dwarf summation rounding."""
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}),",
        f"le0 AS MATERIALIZED ({_CANON_UND}),",
        "lact0 AS MATERIALIZED (SELECT TRUE AS act),",
    ]
    for lv in range(levels):
        parts += _level_frames("l", lv)
        # 1. local move, seeded with the previous level's coarse assignment
        if lv == 0:
            parts.append(
                f"lM{lv}c0 AS MATERIALIZED (SELECT i, i AS c FROM ldeg{lv}),"
            )
        else:
            parts.append(
                f"lM{lv}c0 AS MATERIALIZED (SELECT d.i, COALESCE(s.c, d.i) AS c"
                f" FROM ldeg{lv} d LEFT JOIN lsd{lv - 1} s ON s.i = d.i),"
            )
        mv, cfin = _move_rounds(
            f"lM{lv}", f"lboth{lv}", f"ldeg{lv}", f"ltm{lv}", rounds, gamma
        )
        parts += mv
        # 2. refinement: singleton restart on intra-community edges (full
        # degree and 2m frames, exactly like the engine's _local_move call)
        parts += [
            f"lintra{lv} AS MATERIALIZED (SELECT b.i, b.j, b.w FROM lboth{lv} b"
            f" JOIN {cfin} ci ON ci.i = b.i JOIN {cfin} cj ON cj.i = b.j"
            f" WHERE ci.c = cj.c),",
            f"lR{lv}c0 AS MATERIALIZED (SELECT i, i AS c FROM ldeg{lv}),",
        ]
        rv, rfin = _move_rounds(
            f"lR{lv}", f"lintra{lv}", f"ldeg{lv}", f"ltm{lv}", rounds, gamma
        )
        parts += rv
        parts += [
            # canonicalize refined piece labels to min member id
            f"lrc{lv} AS MATERIALIZED (SELECT c, MIN(i) rc FROM {rfin} GROUP BY c),",
            f"lref{lv} AS MATERIALIZED (SELECT m.i, n.rc AS r FROM {rfin} m"
            f" JOIN lrc{lv} n ON n.c = m.c),",
            # coarse community of each refined piece (next level's seed)
            f"lsd{lv} AS MATERIALIZED (SELECT r.r AS i, MIN(cm.c) AS c"
            f" FROM lref{lv} r JOIN {cfin} cm ON cm.i = r.i GROUP BY r.r),",
            f"lact{lv + 1} AS MATERIALIZED (SELECT (SELECT act FROM lact{lv}) AND"
            f" (SELECT COUNT(DISTINCT r) FROM lref{lv})"
            f" < (SELECT COUNT(*) FROM ldeg{lv}) AS act),",
        ]
        if lv == 0:
            parts.append(
                "lmap0 AS MATERIALIZED (SELECT i AS orig, r AS cur FROM lref0),"
            )
        else:
            parts.append(
                f"lmap{lv} AS MATERIALIZED (SELECT m.orig,"
                f" CASE WHEN (SELECT act FROM lact{lv}) THEN c2.r ELSE m.cur END"
                f" AS cur FROM lmap{lv - 1} m LEFT JOIN lref{lv} c2 ON c2.i = m.cur),"
            )
        # assignment candidate if this were the last executed level
        parts.append(
            f"lasg{lv} AS MATERIALIZED (SELECT m.orig, COALESCE(t.c, m.cur) AS c"
            f" FROM lmap{lv} m LEFT JOIN lsd{lv} t ON t.i = m.cur),"
        )
        if lv < levels - 1:
            # 3. coarsen by the REFINED partition
            parts.append(
                f"le{lv + 1} AS MATERIALIZED (SELECT LEAST(ra.r, rb.r) a,"
                f" GREATEST(ra.r, rb.r) b, SUM(w) w FROM le{lv} e"
                f" JOIN lref{lv} ra ON ra.i = e.a"
                f" JOIN lref{lv} rb ON rb.i = e.b GROUP BY 1, 2),"
            )
    # deepest EXECUTED level's assignment (act_lv <=> level lv ran)
    case = (
        "CASE "
        + " ".join(
            f"WHEN (SELECT act FROM lact{lv}) THEN a{lv}.c"
            for lv in range(levels - 1, 0, -1)
        )
        + " ELSE a0.c END"
    )
    joins = " ".join(
        f"JOIN lasg{lv} a{lv} ON a{lv}.orig = a0.orig" for lv in range(1, levels)
    )
    parts.append(
        f"lsel AS MATERIALIZED (SELECT a0.orig AS v, {case} AS c"
        f" FROM lasg0 a0 {joins}),"
    )
    # 4. compound-move polish: Louvain level loop over the community graph
    parts.append(
        "pe0 AS MATERIALIZED (SELECT LEAST(ca.c, cb.c) a, GREATEST(ca.c, cb.c) b,"
        " SUM(w) w FROM le0 e JOIN lsel ca ON ca.v = e.a"
        " JOIN lsel cb ON cb.v = e.b GROUP BY 1, 2),"
    )
    blk, pmap = _louvain_block("p", rounds, levels, gamma)
    parts += blk
    parts.append(
        f"mpol AS MATERIALIZED (SELECT s.v, COALESCE(p.cur, s.c) AS c"
        f" FROM lsel s LEFT JOIN {pmap} p ON p.orig = s.c),"
    )
    # modularity of both assignments over the ORIGINAL frame (le0 has no
    # self-loops, so Q = in_both/2m − γ·Σ(sig/2m)²)
    for nm, src in (("qa", "lsel"), ("qb", "mpol")):
        parts.append(
            f"{nm} AS MATERIALIZED (SELECT"
            f" COALESCE((SELECT SUM(b.w) FROM lboth0 b"
            f" JOIN {src} x ON x.v = b.i JOIN {src} y ON y.v = b.j"
            f" WHERE x.c = y.c), 0.0) / (SELECT tm FROM ltm0)"
            f" - {gamma} * COALESCE((SELECT"
            f" SUM((sig / (SELECT tm FROM ltm0)) * (sig / (SELECT tm FROM ltm0)))"
            f" FROM (SELECT SUM(d.k) sig FROM {src} x"
            f" JOIN ldeg0 d ON d.i = x.v GROUP BY x.c)), 0.0) AS q),"
        )
    parts.append(
        "lfin AS MATERIALIZED (SELECT s.v,"
        " CASE WHEN (SELECT q FROM qb) > (SELECT q FROM qa) THEN m.c ELSE s.c END"
        " AS c FROM lsel s JOIN mpol m ON m.v = s.v),"
        " lcanon AS MATERIALIZED (SELECT c, MIN(v) mc FROM lfin GROUP BY c)"
        ' SELECT CAST(f.v AS BIGINT) AS vertex, CAST(c.mc AS BIGINT) AS "partition"'
        " FROM lfin f JOIN lcanon c ON c.c = f.c"
    )
    return "\n".join(parts)


def _sql_ecg(
    ensemble: int = 4,
    rounds: int = 6,
    levels: int = 10,
    min_weight: float = 0.05,
    gamma: float = 1.0,
) -> str:
    """Exact unrolled mirror of :mod:`cugraph_spark.operators.ecg`: one
    single-level local move per seeded id permutation ``(a_r·i + b_r) mod
    p`` (p = smallest prime > V, computed in SQL; the a_r % p != 0 guard
    mirrored by first-valid-index selection), co-membership votes per
    canonical edge, reweight ``min_w + (1−min_w)·s/E``, then the full
    Louvain level loop on the reweighted graph (whose undirected build
    doubles each canonical weight — exact ×2 in binary64).

    Unlike louvain/leiden, the final phase sums NON-integer weights, so
    its sums carry order-dependent last-ulp rounding; the mirror is exact
    unless two candidate communities tie in real arithmetic, which the
    sf fixtures do not exhibit (validated empirically)."""
    prime_pairs = [
        (0, 1299721, 7), (1, 15485863, 13), (2, 32452843, 29),
        (3, 49979687, 41), (4, 67867967, 53), (5, 86028121, 67),
        (6, 104395301, 79), (7, 122949823, 97),
    ]
    vals = ", ".join(f"({i}, {a}, {b})" for i, a, b in prime_pairs)
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}),",
        f"ee0 AS MATERIALIZED ({_CANON_UND}),",
        # level-0 frames (no self-loops at level 0: src != dst upstream)
        "eboth AS MATERIALIZED (SELECT a i, b j, w FROM ee0"
        " UNION ALL SELECT b, a, w FROM ee0),",
        "edeg AS MATERIALIZED (SELECT i, SUM(w) k FROM eboth GROUP BY i),",
        "etm AS MATERIALIZED (SELECT SUM(k) tm FROM edeg),",
        "env AS MATERIALIZED (SELECT COUNT(*) n FROM edeg),",
        # smallest prime > V (mirrors _next_prime_above)
        "epr AS MATERIALIZED (SELECT MIN(x) p FROM range(2, 3000) t(x)"
        " WHERE x > (SELECT n FROM env) AND NOT EXISTS"
        " (SELECT 1 FROM range(2, 60) d(y) WHERE y * y <= x AND x % y = 0)),",
        f"etab AS MATERIALIZED (SELECT * FROM (VALUES {vals}) t(idx, pa, pb)),",
    ]
    vote_units = []
    for r in range(ensemble):
        # CONSTANTS AS CROSS JOINS, never scalar subqueries inside hot
        # expressions or join conditions: DuckDB re-evaluates a correlated
        # scalar subquery per probe row and the per-evaluation allocation
        # blew past 19 GB RSS / 400 s on the sf0.01 fixture (observed OOM
        # poisoning the NEXT oracle in the driver's shared connection); a
        # one-row cross join folds to the same constant with zero overhead.
        parts += [
            # first table index >= r whose multiplier is nonzero mod p
            f"esel{r} AS MATERIALIZED (SELECT t.pa, t.pb, q.p FROM etab t"
            f" CROSS JOIN epr q WHERE t.idx >= {r}"
            f" AND t.pa % q.p != 0 ORDER BY t.idx LIMIT 1),",
            f"eb{r} AS MATERIALIZED (SELECT (s.pa * e.i + s.pb) % s.p AS i,"
            f" (s.pa * e.j + s.pb) % s.p AS j, e.w"
            f" FROM eboth e CROSS JOIN esel{r} s),",
            f"ed{r} AS MATERIALIZED (SELECT (s.pa * d.i + s.pb) % s.p AS i,"
            f" d.k FROM edeg d CROSS JOIN esel{r} s),",
            f"eM{r}c0 AS MATERIALIZED (SELECT i, i AS c FROM ed{r}),",
        ]
        mv, cfin = _move_rounds(f"eM{r}", f"eb{r}", f"ed{r}", "etm", rounds, gamma)
        parts += mv
        parts += [
            # permuted endpoints as plain columns so the vote join hashes
            f"epm{r} AS MATERIALIZED (SELECT e.a, e.b,"
            f" (s.pa * e.a + s.pb) % s.p AS qa,"
            f" (s.pa * e.b + s.pb) % s.p AS qb"
            f" FROM ee0 e CROSS JOIN esel{r} s),",
            f"ev{r} AS MATERIALIZED (SELECT e.a, e.b,"
            f" CASE WHEN ca.c = cb.c THEN 1 ELSE 0 END s FROM epm{r} e"
            f" JOIN {cfin} ca ON ca.i = e.qa"
            f" JOIN {cfin} cb ON cb.i = e.qb),",
        ]
        vote_units.append(f"SELECT a, b, s FROM ev{r}")
    parts.append(
        f"evotes AS MATERIALIZED (SELECT a, b, SUM(s) s FROM"
        f" ({' UNION ALL '.join(vote_units)}) GROUP BY a, b),"
    )
    # reweight, then the undirected LinkGraph build + louvain's canonical
    # re-aggregation doubles each weight (w + w, exact in binary64)
    parts.append(
        f"fe0 AS MATERIALIZED (SELECT e.a, e.b,"
        f" ({min_weight} + (1.0 - {min_weight}) * (CAST(v.s AS DOUBLE) / {float(ensemble)}))"
        f" + ({min_weight} + (1.0 - {min_weight}) * (CAST(v.s AS DOUBLE) / {float(ensemble)}))"
        f" AS w FROM ee0 e JOIN evotes v ON v.a = e.a AND v.b = e.b),"
    )
    blk, fmap = _louvain_block("f", rounds, levels, gamma)
    parts += blk
    parts.append(
        f"fin AS MATERIALIZED (SELECT orig AS v, cur AS p FROM {fmap}),"
        " canon AS MATERIALIZED (SELECT p, MIN(v) mc FROM fin GROUP BY p)"
        ' SELECT CAST(f.v AS BIGINT) AS vertex, CAST(c.mc AS BIGINT) AS "partition"'
        " FROM fin f JOIN canon c ON c.p = f.p"
    )
    return "\n".join(parts)


def _sql_wcc() -> str:
    return f"""
WITH RECURSIVE edges AS ({_EDGES}), verts AS ({_VERTS}),
sym AS ({_SYM}),
reach(v, u) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.v, s.dst FROM reach r JOIN sym s ON s.src = r.u
)
SELECT CAST(v AS BIGINT) AS vertex, CAST(MIN(u) AS BIGINT) AS labels
FROM reach GROUP BY v
"""


def _sql_lpa(iters: int = LPA_ITERS) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), verts AS MATERIALIZED ({_VERTS}),",
        f"sym AS MATERIALIZED ({_SYM}),",
        "l0 AS MATERIALIZED (SELECT v, v AS lab FROM verts),",
    ]
    for i in range(iters):
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT s.dst AS v, l.lab FROM sym s JOIN l{i} l ON l.v = s.src "
            f"UNION ALL SELECT v, lab FROM l{i}),"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT v, lab, COUNT(*) c FROM v{i} GROUP BY v, lab),"
        )
        parts.append(
            f"l{i+1} AS MATERIALIZED (SELECT v, lab FROM (SELECT v, lab, "
            f"ROW_NUMBER() OVER (PARTITION BY v ORDER BY c DESC, lab ASC) rn "
            f"FROM c{i}) WHERE rn = 1),"
        )
    parts.append(
        f"fin AS (SELECT * FROM l{iters}) "
        "SELECT CAST(v AS BIGINT) AS vertex, CAST(lab AS BIGINT) AS label FROM fin"
    )
    return "\n".join(parts)


def _sql_triangles() -> str:
    return f"""
WITH edges AS ({_EDGES}), verts AS ({_VERTS}),
pairs AS (SELECT DISTINCT LEAST(src, dst) u, GREATEST(src, dst) w
          FROM edges WHERE src != dst),
tri AS (SELECT a.u x, a.w y, b.w z FROM pairs a
        JOIN pairs b ON b.u = a.w
        JOIN pairs c ON c.u = a.u AND c.w = b.w),
credits AS (SELECT x AS vx FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
SELECT CAST(verts.v AS BIGINT) AS vertex, CAST(COALESCE(t.c, 0) AS BIGINT) AS counts
FROM verts LEFT JOIN (SELECT vx, COUNT(*) c FROM credits GROUP BY vx) t ON t.vx = verts.v
"""


def _sql_bfs() -> str:
    return f"""
WITH RECURSIVE edges AS ({_EDGES}),
walk(v, d) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v WHERE w.d < 100
)
SELECT CAST(v AS BIGINT) AS vertex, CAST(MIN(d) AS INT) AS distance
FROM walk GROUP BY v
"""


def _sql_two_hop() -> str:
    return f"""
WITH edges AS ({_EDGES})
SELECT DISTINCT CAST(a.src AS BIGINT) AS first, CAST(b.dst AS BIGINT) AS second
FROM edges a JOIN edges b ON a.dst = b.src
WHERE a.src != b.dst
"""


def _sql_gnn_sample() -> str:
    # rebuild the EXACT modular rank keys the Spark sampler uses
    from cugraph_spark.gnn import _next_prime_above, rank_constants

    p = _next_prime_above(K)
    a0, c0 = rank_constants(0, 11, p)
    a1, c1 = rank_constants(1, 11, p)
    return f"""
WITH edges AS ({_EDGES}),
seeds AS (SELECT v AS id, CAST(v % 4 AS BIGINT) AS batch_id
          FROM ({_VERTS}) WHERE v % 29 = 3),
h0 AS (SELECT s.batch_id, e.src, e.dst,
              ROW_NUMBER() OVER (PARTITION BY s.batch_id, e.src
                                 ORDER BY ({a0}*e.dst + {c0}) % {p}, e.dst) AS rn
       FROM edges e JOIN seeds s ON e.src = s.id),
hop0 AS (SELECT batch_id, src, dst FROM h0 WHERE rn <= 3),
f1 AS (SELECT DISTINCT batch_id, dst AS id FROM hop0),
h1 AS (SELECT f.batch_id, e.src, e.dst,
              ROW_NUMBER() OVER (PARTITION BY f.batch_id, e.src
                                 ORDER BY ({a1}*e.dst + {c1}) % {p}, e.dst) AS rn
       FROM edges e JOIN f1 f ON e.src = f.id),
hop1 AS (SELECT batch_id, src, dst FROM h1 WHERE rn <= 2)
SELECT batch_id, CAST(0 AS BIGINT) AS hop_id,
       CAST(src AS BIGINT) AS sources, CAST(dst AS BIGINT) AS destinations
FROM hop0
UNION ALL
SELECT batch_id, CAST(1 AS BIGINT) AS hop_id,
       CAST(src AS BIGINT) AS sources, CAST(dst AS BIGINT) AS destinations
FROM hop1
"""


def _sql_walk_paths() -> str:
    # rebuild the per-step modular rank keys of the deterministic walk —
    # the unroll length and rank seeds derive from the SAME WALK_SEED /
    # WALK_DEPTH constants _q_walk_paths passes to random_walks
    from cugraph_spark.gnn import _next_prime_above, rank_constants

    p = _next_prime_above(K)
    steps = list(range(1, WALK_DEPTH))
    ks = {s: rank_constants(s, WALK_SEED, p) for s in steps}

    def hop(s: int, prev: str) -> str:
        a, c = ks[s]
        return f"""
s{s} AS (SELECT w.walk_id, e.dst,
               ROW_NUMBER() OVER (PARTITION BY w.walk_id
                                  ORDER BY ({a}*e.dst + {c}) % {p}, e.dst) AS rn
        FROM {prev} w JOIN edges e ON e.src = w.v),
w{s} AS (SELECT walk_id, dst AS v FROM s{s} WHERE rn = 1)"""

    hops = ",\n".join(hop(s, f"w{s - 1}") for s in steps)
    selects = "\nUNION ALL\n".join(
        f"SELECT walk_id, CAST({s} AS BIGINT) AS step, "
        f"CAST(v AS BIGINT) AS vertex FROM w{s}"
        for s in [0] + steps
    )
    return f"""
WITH edges AS ({_EDGES}),
starts AS (SELECT v FROM ({_VERTS}) WHERE v % 37 = 1),
w0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY v) - 1 AS BIGINT) AS walk_id, v
       FROM starts),
{hops}
{selects}
"""


def _sql_und_edges() -> str:
    return f"""
WITH edges AS ({_EDGES})
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst FROM ({_SYM})
"""


def _sql_hypergraph_edges() -> str:
    return """
WITH rows_sel AS (
  SELECT user_id, event_type FROM events
  WHERE event_id % 101 = 5 AND user_id IS NOT NULL AND event_type IS NOT NULL
),
rid AS (
  SELECT user_id, event_type,
         CAST(ROW_NUMBER() OVER (ORDER BY user_id, event_type) - 1 AS BIGINT) AS rn
  FROM rows_sel
)
SELECT 'row::' || CAST(rn AS VARCHAR) AS src,
       'user_id::' || CAST(user_id AS VARCHAR) AS dst
FROM rid
UNION ALL
SELECT 'row::' || CAST(rn AS VARCHAR) AS src,
       'event_type::' || event_type AS dst
FROM rid
"""


def _sql_pg_subgraph() -> str:
    return """
SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src,
                CAST(o_orderkey AS BIGINT) AS dst
FROM orders WHERE o_totalprice > 150000
"""


def _sql_jaccard() -> str:
    return f"""
WITH edges AS ({_EDGES}),
sym AS (SELECT DISTINCT src, dst FROM ({_SYM}) WHERE src != dst),
deg AS (SELECT src v, COUNT(*) deg FROM sym GROUP BY src),
inter AS (SELECT a.src fa, b.src fb, COUNT(*) isect FROM sym a
          JOIN sym b ON a.dst = b.dst AND a.src < b.src GROUP BY a.src, b.src)
SELECT CAST(fa AS BIGINT) AS first, CAST(fb AS BIGINT) AS second,
       ROUND(CAST(isect AS DOUBLE) / (da.deg + db.deg - isect), 6) AS jaccard_coeff
FROM inter JOIN deg da ON da.v = fa JOIN deg db ON db.v = fb
"""


def _sql_sssp() -> str:
    return f"""
WITH RECURSIVE edges AS ({_EDGES}),
walk(v, d) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v WHERE w.d < 100
)
SELECT CAST(v AS BIGINT) AS vertex, CAST(MIN(d) AS DOUBLE) AS distance
FROM walk GROUP BY v
"""


def _sql_degree_centrality() -> str:
    return f"""
WITH edges AS ({_EDGES}), verts AS ({_VERTS}),
nv AS (SELECT CAST(COUNT(*) AS DOUBLE) n FROM verts)
SELECT CAST(verts.v AS BIGINT) AS vertex,
       ROUND((COALESCE(i.c, 0) + COALESCE(o.c, 0)) / ((SELECT n FROM nv) - 1), 6)
           AS degree_centrality
FROM verts
LEFT JOIN (SELECT dst, COUNT(*) c FROM edges GROUP BY dst) i ON i.dst = verts.v
LEFT JOIN (SELECT src, COUNT(*) c FROM edges GROUP BY src) o ON o.src = verts.v
"""


def _sql_pair_coeff(expr: str, alias: str) -> str:
    return f"""
WITH edges AS ({_EDGES}),
sym AS (SELECT DISTINCT src, dst FROM ({_SYM}) WHERE src != dst),
deg AS (SELECT src v, COUNT(*) deg FROM sym GROUP BY src),
inter AS (SELECT a.src fa, b.src fb, COUNT(*) isect FROM sym a
          JOIN sym b ON a.dst = b.dst AND a.src < b.src GROUP BY a.src, b.src)
SELECT CAST(fa AS BIGINT) AS first, CAST(fb AS BIGINT) AS second,
       ROUND({expr}, 6) AS {alias}
FROM inter JOIN deg da ON da.v = fa JOIN deg db ON db.v = fb
"""


def _sql_hits(iters: int = 8, h0_expr: str = "1.0/(SELECT n FROM nv)") -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), verts AS MATERIALIZED ({_VERTS}),",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) n FROM verts),",
        f"h0 AS MATERIALIZED (SELECT v, {h0_expr} AS hub FROM verts),",
    ]
    for i in range(iters):
        parts.append(
            f"ar{i} AS MATERIALIZED (SELECT verts.v, CAST(COALESCE(x.s, 0) AS DOUBLE) AS auth_raw "
            f"FROM verts LEFT JOIN (SELECT e.dst v, SUM(h.hub) s FROM edges e "
            f"JOIN h{i} h ON h.v = e.src GROUP BY e.dst) x ON x.v = verts.v),"
        )
        parts.append(
            f"hr{i} AS MATERIALIZED (SELECT verts.v, CAST(COALESCE(x.s, 0) AS DOUBLE) AS hub_raw "
            f"FROM verts LEFT JOIN (SELECT e.src v, SUM(a.auth_raw) s FROM edges e "
            f"JOIN ar{i} a ON a.v = e.dst GROUP BY e.src) x ON x.v = verts.v),"
        )
        parts.append(
            f"h{i+1} AS MATERIALIZED (SELECT v, hub_raw / (SELECT MAX(hub_raw) FROM hr{i}) AS hub FROM hr{i}),"
        )
        parts.append(
            f"a{i+1} AS MATERIALIZED (SELECT v, auth_raw / (SELECT MAX(auth_raw) FROM ar{i}) AS auth FROM ar{i}),"
        )
    parts.append(
        f"fin AS (SELECT h.v, h.hub, a.auth FROM h{iters} h JOIN a{iters} a ON a.v = h.v) "
        "SELECT CAST(v AS BIGINT) AS vertex, "
        "ROUND(hub / (SELECT SUM(hub) FROM fin), 6) AS hubs, "
        "ROUND(auth / (SELECT SUM(auth) FROM fin), 6) AS authorities FROM fin"
    )
    return "\n".join(parts)


def _sql_katz(iters: int = 8, alpha: float = 0.005, beta: float = 1.0) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), verts AS MATERIALIZED ({_VERTS}),",
        "x0 AS MATERIALIZED (SELECT v, CAST(0.0 AS DOUBLE) AS x FROM verts),",
    ]
    for i in range(iters):
        parts.append(
            f"x{i+1} AS MATERIALIZED (SELECT verts.v, {alpha} * CAST(COALESCE(g.s, 0) AS DOUBLE) + {beta} AS x "
            f"FROM verts LEFT JOIN (SELECT e.dst v, SUM(x.x) s FROM edges e "
            f"JOIN x{i} x ON x.v = e.src GROUP BY e.dst) g ON g.v = verts.v),"
        )
    parts.append(
        f"l2 AS (SELECT SQRT(SUM(x * x)) nrm FROM x{iters}) "
        f"SELECT CAST(v AS BIGINT) AS vertex, "
        f"ROUND(x / (SELECT nrm FROM l2), 6) AS katz_centrality FROM x{iters}"
    )
    return "\n".join(parts)


def _sql_eigenvector(iters: int = 8) -> str:
    parts = [
        f"WITH edges AS MATERIALIZED ({_EDGES}), verts AS MATERIALIZED ({_VERTS}),",
        "nv AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) n FROM verts),",
        "x0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nv) AS x FROM verts),",
    ]
    for i in range(iters):
        parts.append(
            f"g{i} AS MATERIALIZED (SELECT verts.v, CAST(COALESCE(g.s, 0) AS DOUBLE) AS g "
            f"FROM verts LEFT JOIN (SELECT e.dst v, SUM(x.x) s FROM edges e "
            f"JOIN x{i} x ON x.v = e.src GROUP BY e.dst) g ON g.v = verts.v),"
        )
        parts.append(
            f"x{i+1} AS MATERIALIZED (SELECT v, g / (SELECT SQRT(SUM(g * g)) FROM g{i}) AS x FROM g{i}),"
        )
    parts.append(
        f"fin AS (SELECT * FROM x{iters}) "
        "SELECT CAST(v AS BIGINT) AS vertex, ROUND(x, 6) AS eigenvector_centrality FROM fin"
    )
    return "\n".join(parts)


def _sql_induced_subgraph() -> str:
    return f"""
WITH edges AS ({_EDGES})
SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst
FROM edges WHERE src < 300 AND dst < 300
"""


def _sql_ego_graph() -> str:
    return f"""
WITH edges AS ({_EDGES}),
sym AS ({_SYM}),
n1 AS (SELECT DISTINCT dst v FROM sym WHERE src = 1),
n2 AS (SELECT DISTINCT s.dst v FROM sym s JOIN n1 ON s.src = n1.v),
keep AS (SELECT CAST(1 AS BIGINT) v UNION SELECT v FROM n1 UNION SELECT v FROM n2)
SELECT CAST(e.src AS BIGINT) AS src, CAST(e.dst AS BIGINT) AS dst
FROM edges e JOIN keep a ON e.src = a.v JOIN keep b ON e.dst = b.v
"""


def _sql_scc() -> str:
    return f"""
WITH RECURSIVE edges AS ({_EDGES}), verts AS ({_VERTS}),
reach(v, u) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.v, e.dst FROM reach r JOIN edges e ON e.src = r.u
),
mutual AS (SELECT r1.v, r1.u FROM reach r1 JOIN reach r2 ON r1.v = r2.u AND r1.u = r2.v)
SELECT CAST(verts.v AS BIGINT) AS vertex,
       CAST(LEAST(verts.v, COALESCE(p.mn, verts.v)) AS BIGINT) AS labels
FROM verts LEFT JOIN (SELECT v, MIN(u) mn FROM mutual GROUP BY v) p ON p.v = verts.v
"""


def _sql_traversed_cost() -> str:
    """BFS-tree path costs: reconstruct the deterministic predecessor
    (MIN(src) at the previous level — the same rule bfs() applies), then
    walk each chain recursively, summing the min-symmetrized weights."""
    return f"""
WITH RECURSIVE edges AS ({_EDGES}),
walk(v, d) AS (
  SELECT CAST(1 AS BIGINT), 0
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.v WHERE w.d < 100
),
dist AS (SELECT v, MIN(d) AS d FROM walk GROUP BY v),
pred AS (
  SELECT e.dst AS v, MIN(e.src) AS p
  FROM edges e
  JOIN dist ds ON ds.v = e.src
  JOIN dist dd ON dd.v = e.dst AND dd.d = ds.d + 1
  GROUP BY e.dst
),
wsym AS (
  SELECT s, t, MIN(w) AS w FROM (
    SELECT src AS s, dst AS t,
           CAST((src * 131 + dst * 17) % 97 + 1 AS DOUBLE) AS w FROM edges
    UNION ALL
    SELECT dst AS s, src AS t,
           CAST((src * 131 + dst * 17) % 97 + 1 AS DOUBLE) AS w FROM edges
  ) GROUP BY s, t
),
chain(v, cur, cost) AS (
  SELECT v, v, CAST(0 AS DOUBLE) FROM dist
  UNION ALL
  SELECT c.v, p.p, c.cost + wt.w
  FROM chain c
  JOIN pred p ON p.v = c.cur
  JOIN wsym wt ON wt.s = p.p AND wt.t = c.cur
)
SELECT CAST(v AS BIGINT) AS vertex, ROUND(MAX(cost), 6) AS info
FROM chain GROUP BY v
"""


def _sql_bicliques() -> str:
    """Literal SQL restatement of the reference's greedy feature-major loop
    (degree-sorted scan, consecutive machine-set dedup via LAG over the
    canonical member string, co-occurrence qualification, ordinal ids)."""
    return """
WITH e AS (
  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS src, CAST(l_suppkey AS BIGINT) AS dst,
         CASE WHEN l_partkey % 7 = 0 THEN 1 ELSE 0 END AS flag
  FROM lineitem
),
feat AS (
  SELECT dst, COUNT(*) AS cnt,
         SUM(CASE WHEN flag = 1 THEN 1 ELSE 0 END) AS nbad,
         string_agg(src::VARCHAR, ',' ORDER BY src) AS mset
  FROM e GROUP BY dst
),
scan AS (
  SELECT dst, cnt, nbad,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, dst) AS rank,
         LAG(mset) OVER (ORDER BY cnt DESC, dst) AS lmset, mset
  FROM feat
),
cand AS (SELECT dst, cnt, nbad, rank FROM scan WHERE lmset IS NULL OR mset <> lmset),
co AS (
  SELECT e1.dst AS f, e2.dst AS g, COUNT(*) AS co_cnt
  FROM e e1 JOIN cand c ON c.dst = e1.dst JOIN e e2 ON e2.src = e1.src
  GROUP BY e1.dst, e2.dst
),
qual AS (
  SELECT co.f FROM co JOIN cand ON cand.dst = co.f
  WHERE co.co_cnt >= FLOOR(cand.cnt * 0.25)
),
nfeat AS (SELECT f, COUNT(*) AS n_feat FROM qual GROUP BY f),
emit AS (
  SELECT ROW_NUMBER() OVER (ORDER BY rank) - 1 AS id, cnt, nbad, n_feat
  FROM cand JOIN nfeat ON nfeat.f = cand.dst
  WHERE n_feat > 1 AND cnt >= 10
)
SELECT CAST(id AS BIGINT) AS id, CAST(cnt + n_feat AS BIGINT) AS total,
       CAST(cnt AS BIGINT) AS machines, CAST(n_feat AS BIGINT) AS features,
       ROUND(nbad * 1.0 / (cnt + n_feat), 6) AS bad_ratio
FROM emit
"""


def _sql_mst_summary() -> str:
    """A spanning forest of an unweighted graph has V − #components edges
    of weight 1.0 each — checkable from the WCC closure without running an
    MST in SQL."""
    return f"""
WITH RECURSIVE edges AS ({_EDGES}), verts AS ({_VERTS}),
sym AS ({_SYM}),
reach(v, u) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.v, s.dst FROM reach r JOIN sym s ON s.src = r.u
),
comp AS (SELECT v, MIN(u) AS labels FROM reach GROUP BY v)
SELECT CAST((SELECT COUNT(*) FROM verts) - (SELECT COUNT(DISTINCT labels) FROM comp) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM verts) - (SELECT COUNT(DISTINCT labels) FROM comp) AS DOUBLE) AS total_weight
"""


_TOKS = (
    "toks AS (SELECT doc_id, unnest(lst) AS token, generate_subscripts(lst, 1) - 1 AS pos "
    "FROM (SELECT doc_id, string_split(text, ' ') lst FROM documents)), "
    "tk AS (SELECT * FROM toks WHERE token != ''), "
    "vocab AS (SELECT token, ROW_NUMBER() OVER (ORDER BY token) - 1 AS tid "
    "FROM (SELECT DISTINCT token FROM tk)), "
    "tids AS (SELECT t.doc_id, t.pos, v.tid FROM tk t JOIN vocab v USING (token))"
)


def _sql_dedup_exact() -> str:
    return (
        "SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id, "
        "CAST(COUNT(*) AS BIGINT) AS dup_count FROM documents GROUP BY text"
    )


def _sql_doc_stats() -> str:
    stop = ", ".join(f"'{s}'" for s in tx.EN_STOP)
    return f"""
WITH s AS (
  SELECT doc_id,
    len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
    length(text) AS n_chars,
    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS n_punct,
    len(list_filter(string_split(text, ' '), x -> x IN ({stop}))) AS stop_hits
  FROM documents
), r AS (
  SELECT doc_id, n_tokens, n_chars,
    ROUND(CAST(n_punct AS DOUBLE) / GREATEST(n_chars, 1), 6) AS punct_ratio,
    ROUND(CAST(stop_hits AS DOUBLE) / GREATEST(n_tokens, 1), 6) AS stopword_ratio
  FROM s
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_chars AS BIGINT) AS n_chars,
       punct_ratio, stopword_ratio,
       ROUND(0.4 * LEAST(1.0, n_tokens / 100.0)
           + 0.3 * (1.0 - punct_ratio)
           + 0.3 * stopword_ratio, 6) AS quality
FROM r
"""


def _sql_lang_id() -> str:
    score_cols = []
    for lang in tx._LANG_ORDER:
        markers = ", ".join(f"'{m}'" for m in tx.LANG_MARKERS[lang])
        score_cols.append(
            f"len(list_filter(string_split(text, ' '), x -> x IN ({markers}))) AS s_{lang}"
        )
    whens = "\n".join(
        f"    WHEN s_{lang} = best THEN '{lang}'" for lang in tx._LANG_ORDER
    )
    return f"""
WITH s AS (SELECT doc_id, {', '.join(score_cols)} FROM documents),
b AS (SELECT *, GREATEST(s_en, s_de, s_fr, s_es, s_zh) AS best FROM s)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
  CASE WHEN best = 0 THEN 'unk'
{whens}
  END AS pred_lang
FROM b
"""


def _sql_token_rollup() -> str:
    return """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS total_tokens,
       ROUND(AVG(CAST(nt AS DOUBLE)), 6) AS avg_tokens
FROM (SELECT lang, len(list_filter(string_split(text, ' '), x -> x != '')) AS nt
      FROM documents)
GROUP BY lang
"""


def _sql_fingerprint() -> str:
    a = 2654435761 % P
    return f"""
WITH {_TOKS}
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(SUM((tid % {P}) * (({a} * (pos % {P}) + 104729) % {P}) % {P}) % {P} AS BIGINT) AS fp
FROM tids GROUP BY doc_id
"""


def _sql_simhash(bits: int = 32) -> str:
    a_, b_ = 40503, 69997
    sums = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    code = " + ".join(
        f"CASE WHEN b{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(bits)
    )
    return f"""
WITH {_TOKS},
dtid AS (SELECT DISTINCT doc_id, tid FROM tids),
h AS (SELECT doc_id, ({a_} * (tid % {P}) + {b_}) % {P} AS h FROM dtid),
pb AS (SELECT doc_id,
    {sums}
  FROM h GROUP BY doc_id)
SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({code} AS BIGINT) AS simhash FROM pb
"""


def _sql_minhash_near_dup(threshold: float = 0.0) -> str:
    mins = ",\n    ".join(
        f"MIN(({a} * (sh % {P}) + {b}) % {P}) AS h{i}"
        for i, (a, b) in enumerate(tx.MINHASH_AB)
    )
    band_rows = []
    for bi in range(tx.N_BANDS):
        cols = [f"h{bi * tx.ROWS_PER_BAND + r}" for r in range(tx.ROWS_PER_BAND)]
        key = cols[0]
        for c in cols[1:]:
            key = f"(({key}) * {B} + {c}) % {P}"
        band_rows.append(f"SELECT doc_id, {bi} AS band, {key} AS bkey FROM sig")
    bands = " UNION ALL ".join(band_rows)
    return f"""
WITH {_TOKS},
sh3 AS (SELECT doc_id, tid AS t1,
    LEAD(tid, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
    LEAD(tid, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
  FROM tids),
sh AS (SELECT DISTINCT doc_id,
    ((((t1 % {P}) * {B} + t2) % {P}) * {B} + t3) % {P} AS sh
  FROM sh3 WHERE t3 IS NOT NULL),
sig AS (SELECT doc_id,
    {mins}
  FROM sh GROUP BY doc_id),
bands AS ({bands}),
cand AS (SELECT DISTINCT a.doc_id doc_a, b.doc_id doc_b FROM bands a
         JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, COUNT(*) n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id doc_a, b.doc_id doc_b, COUNT(*) isect FROM sh a
          JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2),
ver AS (SELECT c.doc_a, c.doc_b,
    ROUND(CAST(COALESCE(i.isect, 0) AS DOUBLE)
        / (sa.n_sh + sb.n_sh - COALESCE(i.isect, 0)), 6) AS jaccard
  FROM cand c
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b)
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b,
       CAST(jaccard AS DOUBLE) AS jaccard
FROM ver WHERE jaccard >= {threshold}
"""


def _sql_embedding_topk() -> str:
    return """
WITH base AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base),
sims AS (SELECT q.id AS query_id, c.id AS neighbor_id,
    ROUND(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 4) + 0.0 AS cosine
  FROM n q JOIN n c ON c.id != q.id WHERE q.id < 20)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(neighbor_id AS BIGINT) AS neighbor_id,
       cosine,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
FROM sims
QUALIFY rank <= 5
"""


def oracle_sql() -> dict[str, str]:
    return {
        "graph_degrees": _sql_degrees(),
        "pagerank": _sql_pagerank(),
        "pagerank_csr": _sql_pagerank(),
        "wcc": _sql_wcc(),
        "lpa": _sql_lpa(),
        "triangle_counts": _sql_triangles(),
        "bfs": _sql_bfs(),
        "sssp": _sql_sssp(),
        "two_hop": _sql_two_hop(),
        "jaccard": _sql_jaccard(),
        "overlap": _sql_pair_coeff(
            "CAST(isect AS DOUBLE) / LEAST(da.deg, db.deg)", "overlap_coeff"
        ),
        "sorensen": _sql_pair_coeff(
            "2.0 * isect / (da.deg + db.deg)", "sorensen_coeff"
        ),
        "degree_centrality": _sql_degree_centrality(),
        "hits": _sql_hits(),
        "hits_nstart": _sql_hits(
            h0_expr="CASE WHEN v = 1 THEN 10.0 ELSE 1.0/(SELECT n FROM nv) END"
        ),
        "triangles_start": (
            "SELECT * FROM (" + _sql_triangles() + ") WHERE vertex IN (1,2,3,4,5)"
        ),
        "katz": _sql_katz(),
        "eigenvector": _sql_eigenvector(),
        "core_number": _sql_core_number(),
        "induced_subgraph": _sql_induced_subgraph(),
        "ego_graph": _sql_ego_graph(),
        "scc": _sql_scc(),
        "mst_summary": _sql_mst_summary(),
        "bicliques": _sql_bicliques(),
        "traversed_cost": _sql_traversed_cost(),
        "ktruss": _sql_ktruss(),
        "louvain": _sql_louvain(),
        "leiden": _sql_leiden(),
        "ecg": _sql_ecg(),
        "betweenness": _sql_brandes(edge_form=False),
        "edge_betweenness": _sql_brandes(edge_form=True),
        "pagerank_personalized": _sql_pagerank_personalized(),
        "wjaccard": _sql_weighted_pair(
            "CAST(isect AS DOUBLE) / (va.vol + vb.vol - isect)", "jaccard_coeff"
        ),
        "woverlap": _sql_weighted_pair(
            "CAST(isect AS DOUBLE) / LEAST(va.vol, vb.vol)", "overlap_coeff"
        ),
        "wsorensen": _sql_weighted_pair(
            "2.0 * isect / (va.vol + vb.vol)", "sorensen_coeff"
        ),
        "batched_ego": _sql_batched_ego(),
        "embedding_lsh_topk": _sql_embedding_lsh_topk(),
        "dedup_exact": _sql_dedup_exact(),
        "doc_stats": _sql_doc_stats(),
        "lang_id": _sql_lang_id(),
        "token_rollup": _sql_token_rollup(),
        "doc_fingerprint": _sql_fingerprint(),
        "simhash": _sql_simhash(),
        "minhash_near_dup": _sql_minhash_near_dup(),
        "embedding_topk": _sql_embedding_topk(),
        "embedding_neardup": _sql_embedding_neardup(),
        "embedding_ivf_topk": _sql_ivf_topk(),
        "stream_user_totals": _sql_stream_user_totals(),
        "stream_user_totals_multi": _sql_stream_user_totals_multi(),
        "stream_window_rollup": _sql_stream_window_rollup(),
        "clustering_scores": _sql_clustering_scores(),
        "clustering_modularity": _sql_clustering_modularity(),
        "image_stats": _sql_image_stats(),
        "audio_stats": _sql_audio_stats(),
        "video_stats": _sql_video_stats(),
        "lap_assignment": _sql_lap_assignment(),
        "fa2_attraction": _sql_fa2_attraction(),
        "bipartite_sets": _sql_bipartite_sets(),
        "corpus_clean": _sql_corpus_clean(),
        "dedup_cluster": _sql_dedup_cluster(),
        "gnn_sample": _sql_gnn_sample(),
        "walk_paths": _sql_walk_paths(),
        "hypergraph_edges": _sql_hypergraph_edges(),
        "pg_subgraph": _sql_pg_subgraph(),
        "und_edges": _sql_und_edges(),
        "reachable": _sql_sssp(),
    }
