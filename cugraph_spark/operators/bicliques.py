"""Top-k maximal-ish biclique mining over a bipartite edge list.

Reference parity: ``python/cugraph/cugraph/experimental/structure/
bicliques.py:20-150`` (``EXPERIMENTAL__find_bicliques``) — a greedy
feature-major heuristic:

for each feature (dst) in degree-descending order
    M  = machines (src rows) having that feature
    skip if M equals the PREVIOUS feature's machine set (consecutive dedup)
    C  = features shared by >= floor(deg * support) of M's machines
    emit biclique (M, C) if |C| > min_features and |M| >= min_machines
    stop after k emissions (or max_iter features examined)

The reference drives this loop one feature at a time on the host
(``bicliques.py:103-144``). Spark-first restatement: every per-feature
quantity is computed for ALL candidate features at once —

- feature degrees + machine-set fingerprints: one groupBy over the edges;
- the consecutive-dedup "same machines as previous feature" test: a lag
  over the degree-sorted feature frame, realized as a RANGE-PARTITIONED
  two-phase scan (per-partition lag + one tiny per-partition boundary
  frame broadcast back) — never a single-partition global window;
- the "features shared by M's machines" counts: ONE src-keyed
  co-occurrence self-join for all candidates together instead of
  |features| driver-sequential probes.

The emission order / answer-id assignment is the only inherently
sequential step (ids are ordinals by definition); it runs on the
one-row-per-emitted-biclique frame, which is k-bounded when k != -1.

Machine-set equality uses an order-insensitive fingerprint
(``sum_distinct(xxhash64(src))`` + distinct count) instead of
materializing per-feature adjacency lists; identical sets always compare
equal, and a false positive needs a 64-bit hash-sum collision.

Input contract (mirrors the reference): columns ``src`` (machine), ``dst``
(feature, integer), ``flag`` (1 = bad machine, used only for the
``bad_ratio`` stat). The edge list is assumed deduplicated on (src, dst) —
the reference's, fed from its own loader, is too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import truncate_state


def _ordered_scan(feat: DataFrame) -> DataFrame:
    """rank + lag(fp, nsrc) over (cnt DESC, dst ASC) without a global window.

    ``repartitionByRange`` on the sort key gives partitions whose id order
    IS the sort order, so per-partition ``row_number``/``lag`` only need a
    tiny boundary frame (one row per partition: row count + last row's
    fingerprint) broadcast back to finish the scan.
    """
    fr = truncate_state(
        feat.repartitionByRange(F.col("cnt").desc(), F.col("dst"))
        .withColumn("_pid", F.spark_partition_id())
    )
    w_in = Window.partitionBy("_pid").orderBy(F.col("cnt").desc(), F.col("dst"))
    local = (
        fr.withColumn("_rn", F.row_number().over(w_in))
        .withColumn("_lfp", F.lag("fp").over(w_in))
        .withColumn("_lns", F.lag("nsrc").over(w_in))
    )
    meta = fr.groupBy("_pid").agg(
        F.count("*").alias("_n"),
        # last row in (cnt DESC, dst ASC) order = the row minimizing
        # (cnt, -dst): smallest cnt, ties → largest dst
        F.min_by(F.struct("fp", "nsrc"), F.struct(F.col("cnt"), (-F.col("dst")))).alias(
            "_last"
        ),
    )
    wm = Window.orderBy("_pid")  # one row per partition: tiny, driver-safe
    base = meta.select(
        "_pid",
        F.coalesce(
            F.sum("_n").over(wm.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias("_base"),
        F.lag("_last").over(wm).alias("_prev"),
    )
    out = local.join(F.broadcast(base), "_pid").select(
        "dst",
        "cnt",
        "nsrc",
        "nbad",
        "fp",
        (F.col("_base") + F.col("_rn")).alias("rank"),
        F.when(F.col("_rn") > 1, F.col("_lfp")).otherwise(F.col("_prev.fp")).alias("lfp"),
        F.when(F.col("_rn") > 1, F.col("_lns"))
        .otherwise(F.col("_prev.nsrc"))
        .alias("lns"),
    )
    return out


def find_bicliques(
    df: DataFrame,
    k: int,
    offset: int = 0,
    max_iter: int = -1,
    support: float = 1.0,
    min_features: int = 1,
    min_machines: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Greedy top-k bicliques. Returns ``(B, S)``:

    - ``B``: DF[id, vert, type] — biclique membership; type 0 = machine
      (src side), 1 = feature (dst side).
    - ``S``: DF[id, total, machines, features, bad_ratio] — per-biclique
      stats; ``bad_ratio`` = flagged machines / total vertices (the
      reference divides by TOTAL — ``bicliques.py:275-279`` — despite its
      docstring saying "bad machines / total machines"; mirrored).

    Deviation: the reference leaves the feature sort's tie order to cudf
    (unspecified); ties here break on ascending feature id so output is
    deterministic under any parallelism.
    """
    cols = df.columns
    for need in ("src", "dst", "flag"):
        if need not in cols:
            raise NameError(f"{need} column not found")
    if support > 1.0 or support < 0.1:
        raise NameError("support must be between 0.1 and 1.0")

    e = df.select("src", (F.col("dst") - F.lit(offset)).alias("dst"), "flag")

    feat = e.groupBy("dst").agg(
        F.count("*").alias("cnt"),
        F.count_distinct("src").alias("nsrc"),
        # decimal(38,0) accumulator: a long sum of 64-bit hashes overflows
        # under ANSI mode; decimal gives ~1e19 rows of headroom
        F.sum_distinct(F.xxhash64("src").cast("decimal(38,0)")).alias("fp"),
        F.sum(F.when(F.col("flag") == 1, 1).otherwise(0)).alias("nbad"),
    )
    scanned = _ordered_scan(feat)

    cand = scanned.filter(
        ~(F.col("fp").eqNullSafe(F.col("lfp")) & F.col("nsrc").eqNullSafe(F.col("lns")))
    )
    if max_iter != -1:
        cand = cand.filter(F.col("rank") <= max_iter)
    cand = truncate_state(cand.select("dst", "cnt", "nsrc", "nbad", "rank"))

    # one co-occurrence join answers "features shared by M_f" for EVERY f
    mf = e.select(F.col("dst").alias("f"), "src").join(
        cand.select(F.col("dst").alias("f")), "f"
    )
    co = (
        mf.join(e.select("src", F.col("dst").alias("g")), "src")
        .groupBy("f", "g")
        .agg(F.count("*").alias("co_cnt"))
    )
    qual = co.join(
        cand.select(F.col("dst").alias("f"), "cnt"), "f"
    ).filter(F.col("co_cnt") >= F.floor(F.col("cnt") * F.lit(support)))
    nfeat = qual.groupBy("f").agg(F.count("*").alias("n_feat"))

    emit = (
        cand.join(nfeat, cand["dst"] == nfeat["f"])
        .filter(
            (F.col("n_feat") > min_features) & (F.col("cnt") >= min_machines)
        )
        .select("dst", "cnt", "nsrc", "nbad", "rank", "n_feat")
    )
    # ordinal answer ids by scan rank — range-partitioned two-phase scan
    # (assign_dense_ids), not a single-partition global window, so the
    # k=-1 path scales with the emitted-biclique count
    from ..graph import assign_dense_ids

    emit = assign_dense_ids(emit, [F.col("rank").asc()], "id")
    if k > -1:
        emit = emit.filter(F.col("id") < k)
    emit = truncate_state(emit)

    machines = e.join(emit.select(F.col("dst"), "id"), "dst").select(
        "id", F.col("src").alias("vert"), F.lit(0).alias("type")
    )
    features = qual.join(
        emit.select(F.col("dst").alias("f"), "id"), "f"
    ).select("id", F.col("g").alias("vert"), F.lit(1).alias("type"))
    B = machines.union(features)

    S = emit.select(
        "id",
        (F.col("cnt") + F.col("n_feat")).alias("total"),
        F.col("cnt").alias("machines"),
        F.col("n_feat").alias("features"),
        (
            F.col("nbad").cast("double")
            / (F.col("cnt") + F.col("n_feat")).cast("double")
        ).alias("bad_ratio"),
    )
    return B, S
