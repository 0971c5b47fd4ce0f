"""GNN training-data surface (reference ``cugraph/gnn``).

Three components, re-expressed Spark-first:

- :class:`FeatureStore` — reference
  ``gnn/feature_storage/feat_storage.py:26-96`` (a dict of dense arrays
  indexed by ``[indices]``). Same ``add_data``/``get_data``/
  ``get_feature_list`` API with the ``numpy`` backend, plus a ``spark``
  backend where each feature matrix lives in a DataFrame ``(index, feat)``
  so a feature table larger than driver memory still gathers by join.
- :func:`uniform_neighbor_sample_batched` — the batched sampling call the
  reference's BulkSampler makes
  (``gnn/data_loading/bulk_sampler.py:262-273``:
  ``uniform_neighbor_sample(..., with_batch_ids=True)``). One edge join +
  one ``(batch, source)``-windowed rank per hop; with ``deterministic=True``
  the rank key is a seeded modular permutation of the neighbor id (the same
  affine-mod-prime trick as ECG's ensemble permutations, ecg.py), so the
  sampled set is a pure function of ``(edges, seeds, fanouts, seed)`` —
  independent of partitioning and exactly reproducible in ANSI SQL.
- :class:`BulkSampler` — reference
  ``gnn/data_loading/bulk_sampler.py:34-299`` +
  ``bulk_sampler_io.py:_write_samples_to_parquet``: accumulate seed
  batches, auto-flush at ``seeds_per_call``, write minibatch parquet with
  ``batches_per_partition`` batches per partition, empty batches dropped
  and batch ids renumbered contiguous from the minimum input id, optional
  per-batch vertex renumbering with the map emitted alongside.

Scale notes (100 TB): sampling is a join on ``src`` against the
co-partitioned edge frame plus a window partitioned by
``(batch_id, sources)`` — both shuffle on keys with cardinality ≥ the
frontier, no driver materialization anywhere. The reference's
``seeds_per_call`` exists to bound a single GPU call's memory; here the
sampling job is itself distributed, so ``flush()`` handles every
accumulated batch in ONE job and ``seeds_per_call`` only controls the
auto-flush cadence (same observable behavior as the reference's
``add_batches`` trigger, bulk_sampler.py:200-206).
"""

from __future__ import annotations

import logging
import warnings
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .graph import DST, SRC, VID, WGT, LinkGraph, truncate_state
from .operators.ecg import _next_prime_above

log = logging.getLogger(__name__)

# distinct small primes per hop for the deterministic rank permutation
# r(dst) = (a*dst + b) mod p  (p prime > max vertex id → bijection on ids)
_HOP_PRIMES = [
    (40087, 104729), (48611, 86243), (75653, 32479), (15683, 99991),
    (27437, 57829), (88819, 15331), (60493, 42589), (35023, 71993),
]


def rank_constants(hop: int, seed: int, p: int) -> tuple[int, int]:
    """(a, c) for the deterministic rank key ``(a*dst + c) mod p``.

    Affine permutation mod a prime ``p`` exceeding every vertex id; the
    hop index and seed rotate through distinct prime multipliers so hops
    draw independent-looking orders. Guard ``a % p != 0`` exactly as
    ecg.py:101 does (a ≡ 0 would collapse the order to a constant).
    Public so the DuckDB oracle can rebuild the identical key.
    """
    idx = (hop + seed) % len(_HOP_PRIMES)
    a, b = _HOP_PRIMES[idx]
    while a % p == 0:
        idx += 1
        a, b = _HOP_PRIMES[idx % len(_HOP_PRIMES)]
    return a, b + seed


def _rank_expr(col, hop: int, seed: int, p: int):
    a, c = rank_constants(hop, seed, p)
    return (F.lit(a) * col + F.lit(c)) % F.lit(p)


def uniform_neighbor_sample_batched(
    graph: LinkGraph,
    start_df: DataFrame,
    fanout_vals: list,
    seed: int = 42,
    deterministic: bool = True,
    with_weights: bool = False,
    unrenumber: bool = True,
    rank_modulus: int | None = None,
) -> DataFrame:
    """DF[sources, destinations, hop_id, batch_id(, weight)] — per-batch,
    per-hop uniform neighbor sampling (the ``with_batch_ids=True`` form of
    the reference's ``uniform_neighbor_sample``, which BulkSampler drives,
    bulk_sampler.py:262-273).

    ``start_df``'s first two columns are (start vertex, batch id). Each
    hop joins the per-batch frontier to the edge frame and keeps at most
    ``fanout_vals[hop]`` neighbors per (batch, source). With
    ``deterministic=True`` selection order is the modular permutation of
    the neighbor id (reproducible anywhere, including in the DuckDB
    oracle); otherwise a seeded ``F.rand`` (cheaper by one multiply, but
    partitioning-dependent).
    """
    c0, c1 = start_df.columns[0], start_df.columns[1]
    frontier = start_df.select(
        F.col(c0).cast("long").alias(VID), F.col(c1).cast("long").alias("batch_id")
    )
    if graph.renumber_map is not None:
        m = graph.renumber_map.select(
            F.col("ext_id").alias(VID), F.col(VID).alias("_i")
        )
        frontier = frontier.join(
            F.broadcast(m) if graph._map_small() else m, VID
        ).select(F.col("_i").alias(VID), "batch_id")

    if deterministic:
        if rank_modulus is not None:
            # caller knows an upper bound on the id space (e.g. a fixed
            # vertex modulus) — skip the sizing job AND make the sampled
            # set a data-independent function of (seeds, fanouts, seed)
            p = _next_prime_above(int(rank_modulus))
        else:
            # one tiny agg to size the permutation modulus off the id space
            max_id = graph.edges.agg(
                F.greatest(F.max(SRC), F.max(DST)).alias("m")
            ).collect()[0][0]
            p = _next_prime_above(int(max_id) + 1)

    cols = [SRC, DST] + ([WGT] if with_weights and WGT in graph.edges.columns else [])
    results = []
    for hop, fanout in enumerate(fanout_vals):
        cand = graph.edges.select(*cols).join(
            frontier.withColumnRenamed(VID, SRC), SRC
        )
        key = (
            _rank_expr(F.col(DST), hop, seed, p)
            if deterministic
            else F.rand(seed + hop)
        )
        w = Window.partitionBy("batch_id", SRC).orderBy(key, DST)
        sel = [
            F.col(SRC).alias("sources"),
            F.col(DST).alias("destinations"),
            F.lit(hop).cast("int").alias("hop_id"),
            "batch_id",
        ]
        if with_weights and WGT in graph.edges.columns:
            sel.insert(2, F.col(WGT).alias("weight"))
        sampled = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= fanout)
            .select(*sel)
        )
        sampled = truncate_state(sampled)
        results.append(sampled)
        frontier = (
            sampled.select(F.col("destinations").alias(VID), "batch_id").distinct()
        )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    if unrenumber:
        out = graph.unrenumber(out, "sources")
        out = graph.unrenumber(out, "destinations")
    return out


class FeatureStore:
    """Feature storage for GNN minibatch assembly
    (reference ``feat_storage.py:26-96``).

    ``backend="numpy"`` matches the reference exactly: dense in-driver
    arrays, ``get_data`` is fancy indexing. ``backend="spark"`` keeps each
    feature matrix as a DataFrame ``(index: long, feat: array<double>)`` —
    add from a Spark DataFrame, numpy array, or pandas frame; ``get_data``
    gathers the requested rows by broadcast-join and returns numpy in the
    order of ``indices`` (minibatch-sized, so the collect is bounded by
    the caller's batch), while :meth:`get_data_frame` stays distributed.
    """

    def __init__(self, backend: str = "numpy", spark=None):
        if backend not in ("numpy", "spark"):
            raise ValueError(
                f"backend {backend} not supported. "
                "Supported backends are numpy, spark"
            )
        self.fd: dict = defaultdict(dict)
        self.backend = backend
        self._spark = spark

    def add_data(self, feat_obj, type_name: str, feat_name: str) -> None:
        if self.backend == "numpy":
            if isinstance(feat_obj, pd.DataFrame):
                arr = np.asarray(feat_obj.values)
            elif isinstance(feat_obj, DataFrame):
                arr = np.asarray(feat_obj.toPandas().values)
            else:
                arr = np.asarray(feat_obj)
            self.fd[feat_name][type_name] = arr
            return
        self.fd[feat_name][type_name] = self._to_feature_frame(feat_obj)

    def _to_feature_frame(self, feat_obj) -> DataFrame:
        if isinstance(feat_obj, DataFrame):
            cols = feat_obj.columns
            if cols[:1] == ["index"] and cols[1:2] == ["feat"]:
                return feat_obj
            # first col = index, rest = feature components
            return feat_obj.select(
                F.col(cols[0]).cast("long").alias("index"),
                F.array(*[F.col(c).cast("double") for c in cols[1:]]).alias(
                    "feat"
                ),
            )
        arr = np.asarray(
            feat_obj.values if isinstance(feat_obj, pd.DataFrame) else feat_obj,
            dtype="float64",
        )
        if arr.ndim == 1:
            arr = arr[:, None]
        pdf = pd.DataFrame(
            {"index": np.arange(len(arr), dtype="int64"), "feat": list(arr)}
        )
        if self._spark is None:
            raise ValueError(
                "backend='spark' needs a SparkSession (pass spark=) to "
                "ingest driver-side arrays"
            )
        return self._spark.createDataFrame(pdf)

    def _lookup(self, type_name: str, feat_name: str):
        if feat_name not in self.fd:
            raise ValueError(
                f"{feat_name} not found in features: {list(self.fd.keys())}"
            )
        if type_name not in self.fd[feat_name]:
            raise ValueError(
                f"type_name {type_name} not found in"
                f" feature: {list(self.fd[feat_name].keys())}"
            )
        return self.fd[feat_name][type_name]

    def get_data(self, indices, type_name: str, feat_name: str) -> np.ndarray:
        store = self._lookup(type_name, feat_name)
        if self.backend == "numpy":
            return store[indices]
        idx = np.asarray(indices, dtype="int64")
        want = store.sparkSession.createDataFrame(
            pd.DataFrame({"index": idx})
        )
        rows = (
            store.join(F.broadcast(want), "index")
            .select("index", "feat")
            .collect()
        )
        by_id = {r["index"]: r["feat"] for r in rows}
        missing = [int(i) for i in idx if i not in by_id]
        if missing:
            raise IndexError(f"indices not in feature store: {missing[:5]}")
        return np.asarray([by_id[int(i)] for i in idx], dtype="float64")

    def get_data_frame(
        self, indices_df: DataFrame, type_name: str, feat_name: str
    ) -> DataFrame:
        """Distributed gather: join an (index) DataFrame against the
        feature frame — the scale path the driver-side reference API
        cannot offer."""
        if self.backend != "spark":
            raise ValueError("get_data_frame requires backend='spark'")
        store = self._lookup(type_name, feat_name)
        c = indices_df.columns[0]
        return indices_df.select(
            F.col(c).cast("long").alias("index")
        ).join(store, "index")

    def get_feature_list(self) -> dict:
        return {fn: feats.keys() for fn, feats in self.fd.items()}


class BulkSampler:
    """Batched neighbor sampling to parquet minibatch files
    (reference ``bulk_sampler.py:34-299``).

    Same contract: seeds arrive tagged with batch ids via
    :meth:`add_batches`; once ≥ ``seeds_per_call`` seeds are pending the
    sampler auto-flushes; :meth:`flush` samples every pending batch and
    writes parquet under ``output_path`` with ``batches_per_partition``
    batches per partition directory (``batch_partition=N/``). Batches
    that sample zero edges are dropped and the survivors renumbered to
    contiguous ids starting at the minimum pending id — the same
    observable renumbering as bulk_sampler_io.py:86-99 (GitHub #3794
    semantics). With ``renumber=True`` each batch's vertices also get
    dense per-batch ids (seeds-then-frontier order: first hop seen as
    source, then as destination, then vertex id) and the map lands in
    the sibling directory ``<output_path>_renumber_map/``.
    """

    start_col_name = "_START_"
    batch_col_name = "_BATCH_"

    def __init__(
        self,
        batch_size: int,
        output_path: str,
        graph: LinkGraph,
        seeds_per_call: int = 200_000,
        batches_per_partition: int = 100,
        renumber: bool = False,
        log_level: int | None = None,
        fanout_vals: list | None = None,
        seed: int = 42,
        with_weights: bool = False,
        rank_modulus: int | None = None,
    ):
        log.setLevel(log_level or logging.WARNING)
        max_bpp = seeds_per_call // batch_size
        if batches_per_partition > max_bpp:
            warnings.warn(
                f"batches_per_partition ({batches_per_partition}) is > "
                f"seeds_per_call / batch_size ({max_bpp}); automatically "
                f"setting batches_per_partition to {max_bpp}"
            )
            batches_per_partition = max_bpp
        self.batch_size = batch_size
        self.seeds_per_call = seeds_per_call
        self.batches_per_partition = batches_per_partition
        self.renumber = renumber
        self.__output_path = output_path
        self.__graph = graph
        self.__fanout = fanout_vals or [10, 25]
        self.__seed = seed
        self.__with_weights = with_weights
        self.__rank_modulus = rank_modulus
        self.__batches: DataFrame | None = None
        self.__n_pending = 0
        self.__flushes = 0

    @property
    def size(self) -> int:
        return self.__n_pending

    @property
    def renumber_map_path(self) -> str:
        return f"{self.__output_path.rstrip('/')}_renumber_map"

    def add_batches(
        self, df, start_col_name: str, batch_col_name: str
    ) -> None:
        """Accepts a Spark or pandas DataFrame of (start vertex, batch id).

        Mirrors the reference's eager size bookkeeping (its cudf ``len``
        is free; our Spark count is one small job on a two-column frame).
        """
        if isinstance(df, pd.DataFrame):
            spark = self.__graph.edges.sparkSession
            df = spark.createDataFrame(df)
        part = df.select(
            F.col(start_col_name).cast("long").alias(self.start_col_name),
            F.col(batch_col_name).cast("long").alias(self.batch_col_name),
        )
        self.__batches = (
            part if self.__batches is None else self.__batches.unionByName(part)
        )
        self.__n_pending += part.count()
        if self.__n_pending >= self.seeds_per_call:
            log.info(
                "pending seeds %d >= seeds_per_call %d; flushing",
                self.__n_pending,
                self.seeds_per_call,
            )
            self.flush()

    def flush(self) -> None:
        """Samples every pending batch in one distributed job and writes
        the minibatch parquet partitions."""
        if self.__n_pending == 0:
            return
        batches = self.__batches.persist()
        samples = uniform_neighbor_sample_batched(
            self.__graph,
            batches.select(self.start_col_name, self.batch_col_name),
            self.__fanout,
            seed=self.__seed + self.__flushes,
            deterministic=True,
            with_weights=self.__with_weights,
            unrenumber=False,
            rank_modulus=self.__rank_modulus,
        )
        min_id = batches.agg(F.min(self.batch_col_name)).collect()[0][0]

        # drop empty batches, renumber survivors contiguous from min_id
        # (bulk_sampler_io.py:86-99). The distinct-batch-id frame is
        # bounded by seeds_per_call/batch_size, so a driver-side sort +
        # broadcast map beats a single-partition dense_rank window
        ids = sorted(
            r["batch_id"]
            for r in samples.select("batch_id").distinct().collect()
        )
        spark = self.__graph.edges.sparkSession
        present = spark.createDataFrame(
            pd.DataFrame(
                {
                    "batch_id": pd.array(ids, dtype="int64"),
                    "_new": pd.array(
                        range(int(min_id), int(min_id) + len(ids)),
                        dtype="int64",
                    ),
                }
            )
        )
        out = (
            samples.join(F.broadcast(present), "batch_id")
            .drop("batch_id")
            .withColumnRenamed("_new", "batch_id")
            .withColumn(
                "batch_partition",
                ((F.col("batch_id") - F.lit(int(min_id)))
                 / F.lit(self.batches_per_partition)).cast("long"),
            )
        )
        if self.renumber:
            out, rmap = self._renumber_per_batch(out)
            # sibling dir, not a subdir: a subdir would break partition
            # discovery when reading output_path as one parquet table
            (
                rmap.repartition("batch_partition")
                .write.mode("append")
                .partitionBy("batch_partition")
                .parquet(self.renumber_map_path)
            )
        (
            out.repartition("batch_partition")
            .write.mode("append")
            .partitionBy("batch_partition")
            .parquet(self.__output_path)
        )
        batches.unpersist()
        self.__batches = None
        self.__n_pending = 0
        self.__flushes += 1

    def _renumber_per_batch(self, out: DataFrame):
        """Dense per-batch vertex ids, seeds-first order: (first hop seen
        as a source, then as a destination, then vertex id). Windows
        partition by batch — each batch is minibatch-sized, so no skew."""
        appear = out.select(
            "batch_id",
            "batch_partition",
            F.col("sources").alias("v"),
            (F.col("hop_id") * 2).alias("ord"),
        ).unionByName(
            out.select(
                "batch_id",
                "batch_partition",
                F.col("destinations").alias("v"),
                (F.col("hop_id") * 2 + 1).alias("ord"),
            )
        )
        first = appear.groupBy("batch_id", "batch_partition", "v").agg(
            F.min("ord").alias("ord")
        )
        wv = Window.partitionBy("batch_id").orderBy("ord", "v")
        rmap = first.withColumn("map_id", F.row_number().over(wv) - 1).select(
            "batch_id", "batch_partition", F.col("v").alias("vertex"), "map_id"
        )
        ms = rmap.select(
            "batch_id", F.col("vertex").alias("sources"),
            F.col("map_id").alias("_ms"),
        )
        md = rmap.select(
            "batch_id", F.col("vertex").alias("destinations"),
            F.col("map_id").alias("_md"),
        )
        renum = (
            out.join(ms, ["batch_id", "sources"])
            .join(md, ["batch_id", "destinations"])
            .drop("sources", "destinations")
            .withColumnRenamed("_ms", "sources")
            .withColumnRenamed("_md", "destinations")
        )
        return renum, rmap
