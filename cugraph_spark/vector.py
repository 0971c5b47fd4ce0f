"""Similarity search over an embedding column (``array<float>``).

Brute-force cosine top-k as the exact baseline and a deterministic
random-hyperplane LSH bucketing as the scale path (the 100 TB plan: ANN
candidates come from bucket-joins so the cross-product never materializes;
brute force is retained for small query sets and as the recall oracle).

All math is built-in (``F.zip_with``/``F.aggregate`` fold for dot products,
modular-arithmetic hyperplane signs) — no UDFs, SQL-mirrorable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

P = 2_147_483_647


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    num_queries: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """[query_id, neighbor_id, cosine, rank] — exact brute-force top-k.

    Ranking uses the ROUNDED similarity with neighbor-id tie-break so the
    result is deterministic and engine-independent (float32 inputs leave
    ~1e-6 noise in the raw cosine; ranking on raw values would make top-k
    membership engine-dependent near ties).

    Scale: queries × corpus is a broadcast-nested-loop only when the query
    side is tiny; for bulk all-pairs use :func:`lsh_topk`.
    """
    vec = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col).alias("id"), vec.alias("v"), _norm(vec).alias("n"))
    q = base.select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("n").alias("qn")
    )
    if num_queries is not None:
        q = q.filter(F.col("query_id") < num_queries)
    c = base.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("n").alias("cn")
    )
    sims = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                round_digits,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )


QUANT = 1_000_000  # component quantization scale — makes projections integer-exact


def probe_masks(rows_per_band: int, probe_bits: int) -> list[int]:
    """All XOR masks of Hamming weight ≤ ``probe_bits`` over a
    ``rows_per_band``-bit band key, in deterministic order (weight-major,
    then numeric) — shared by :func:`lsh_topk` and its SQL oracle mirror."""
    from itertools import combinations

    masks = [0]
    for w in range(1, min(probe_bits, rows_per_band) + 1):
        masks.extend(
            sorted(sum(1 << b for b in c) for c in combinations(range(rows_per_band), w))
        )
    return masks


def hyperplane_band_keys(
    emb: DataFrame,
    n_planes: int = 64,
    n_bands: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[vec_id, band, bkey] — random-hyperplane LSH band keys.

    Plane components are deterministic ±1 from DOUBLE modular hashing:
    ``h = (a1·(pi·dim + j) + b1) mod p``, ``sign = +1 iff
    ((a2·h + b2) mod p) is odd`` (the stride is the ACTUAL embedding
    dimension, so any dim works).  The second round is load-bearing: the
    parity of a single linear-congruential pass ALTERNATES with the index
    (adding an odd constant flips parity except at wraparound), which
    correlates the planes and collapses LSH recall; hashing the hash
    breaks the structure.  The projected components are quantized to
    integers (``round(x·1e6)``) before summation — the per-plane
    projection is an exact integer, so the signature is bit-identical in
    any engine regardless of summation order (float folds are
    order-sensitive; an oracle reproducing this in SQL would otherwise
    flip near-zero signs).

    Scale: bucket-key space per band is ``2^(n_planes/n_bands)`` — size it
    to the corpus (default 8 bits → 256 buckets/band; at billions of rows
    raise ``n_planes`` so expected bucket occupancy stays bounded).
    """
    if n_planes % n_bands != 0:
        raise ValueError("n_planes must be divisible by n_bands")
    rows_per_band = n_planes // n_bands
    if rows_per_band > 62:
        raise ValueError("rows per band must fit a signed 64-bit key")
    a1, b1 = 1299721, 15485863
    a2, b2 = 48271, 11
    vec = F.col(vec_col).cast("array<double>")
    ed = emb.select(
        F.col(id_col),
        F.size(vec).cast("long").alias("_dim"),
        F.posexplode(vec).alias("j", "x"),
    ).withColumn("xq", F.round(F.col("x") * F.lit(QUANT)).cast("long"))
    planes = ed.select(
        id_col,
        "_dim",
        "j",
        "xq",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("pi"),
    )
    idx = (F.col("pi") * F.col("_dim") + F.col("j")).cast("long")
    h1 = (F.lit(a1) * idx + F.lit(b1)) % F.lit(P)
    sgn = F.when(
        ((F.lit(a2) * h1 + F.lit(b2)) % F.lit(P)) % 2 == 1, F.lit(1).cast("long")
    ).otherwise(F.lit(-1).cast("long"))
    proj = (
        planes.withColumn("_t", sgn * F.col("xq"))
        .groupBy(id_col, "pi")
        .agg(F.sum("_t").alias("dot"))
    )
    bit = F.when(F.col("dot") > 0, F.lit(1).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
    band = (F.col("pi") / F.lit(rows_per_band)).cast("int").alias("band")
    # shiftleft's python wrapper wants an int literal; the SQL form takes a col
    pow2 = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pi % {rows_per_band} AS INT))"
    )
    return (
        proj.select(id_col, band, (bit * pow2).alias("_b"))
        .groupBy(id_col, "band")
        .agg(F.sum("_b").alias("bkey"))
    )


def embedding_neardup(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 64,
    n_bands: int = 8,
    probe_bits: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """[vec_a, vec_b, cosine] — embedding-cosine near-duplicate pairs
    (a < b): candidates collide on ≥1 LSH band exactly or within Hamming
    distance ``probe_bits`` (one-sided multi-probe), verified with exact
    cosine ≥ ``threshold``.

    The dedup-by-meaning member of the near-dup family (exact / MinHash /
    SimHash / n-gram Jaccard live in :mod:`cugraph_spark.text`): at 100 TB
    the all-pairs cosine is unrunnable, but near-duplicates at the
    threshold collide on a probed band with high probability, so the band
    equi-join keeps candidate count O(N · bucket occupancy · n_masks).
    At cosine exactly 0.9 a raw 8-bit band collides with p≈0.29 (recall
    1-(1-p)^8 ≈ 0.93 in theory, ~0.81 measured with quantization);
    Hamming-1 probing lifts per-band collision to ≈0.68 → recall ≳0.99 at
    a 9× candidate fan-out on one side only.
    """
    rows_per_band = n_planes // n_bands
    bands = hyperplane_band_keys(emb, n_planes, n_bands, id_col, vec_col)
    masks = probe_masks(rows_per_band, probe_bits)
    if len(masks) > 1:
        flips = F.array(*[F.lit(m) for m in masks])
        l = bands.select(
            F.col(id_col).alias("vec_a"),
            "band",
            F.explode(flips).alias("_f"),
            "bkey",
        ).select(
            "vec_a", "band", F.col("bkey").bitwiseXOR(F.col("_f")).alias("bkey")
        )
    else:
        l = bands.select(F.col(id_col).alias("vec_a"), "band", "bkey")
    r = bands.select(F.col(id_col).alias("vec_b"), "band", "bkey")
    cand = (
        l.join(r, ["band", "bkey"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    vec = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col).alias("id"), vec.alias("v"), _norm(vec).alias("n"))
    return (
        cand.join(
            base.select(F.col("id").alias("vec_a"), F.col("v").alias("av"), F.col("n").alias("an")),
            "vec_a",
        )
        .join(
            base.select(F.col("id").alias("vec_b"), F.col("v").alias("bv"), F.col("n").alias("bn")),
            "vec_b",
        )
        .select(
            "vec_a",
            "vec_b",
            F.round(
                _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")),
                round_digits,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ------------------------------------------------------------------ IVF ANN
IVF_A, IVF_B = 48611, 102953  # seed-selection hash (a·id + b) mod P


def _quantized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """[id, xq] — per-vector integer-quantized components
    (``round(x·1e6)`` as array<double> of exact integer values): folds over
    these arrays are over EXACT inputs in index order, so every score is
    bit-identical in any engine."""
    vec = F.col(vec_col).cast("array<double>")
    return emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec, lambda x: F.round(x * F.lit(QUANT)).cast("double")).alias("xq"),
    )


def _cell_score(xq, cq, round_digits: int = 4):
    """Cosine-up-to-a-per-row-constant between a quantized vector and a
    centroid: dot(xq, cq) / ‖cq‖ — the ‖xq‖ factor is constant within an
    argmax over cells, so it cancels.  Rounded so the argmax tie-break is
    engine-independent."""
    return F.round(
        _dot(xq, cq) / F.sqrt(_dot(cq, cq)), round_digits
    )


def ivf_cells(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF coarse quantizer: returns ``(assign, centroids)`` —
    ``assign``: [id, cell]; ``centroids``: [cell, cq: array<double>].

    Deterministic, engine-mirrorable k-means-lite:

    1. seeds = the ``n_cells`` vectors with smallest ``(48611·id + 102953)
       mod P`` (hash order ≈ uniform sample; tie-break id),
    2. assign every vector to the max-cosine seed (quantized integer dot,
       tie-break smallest cell),
    3. one Lloyd step: centroid = per-component SUM of member vectors
       (exact integer sums — order-free; the un-normalized sum points the
       same direction as the mean, and cosine only needs direction),
    4. re-assign to the refined centroids.

    Scale: the centroid table is n_cells × dim — broadcast-sized by
    construction; both assignment passes are a broadcast join + one
    groupBy, never a shuffle of the corpus by anything but id.
    """
    q = _quantized(emb, id_col, vec_col)
    h = (F.lit(IVF_A) * F.col("id") + F.lit(IVF_B)) % F.lit(P)
    seeds = (
        q.select("id", "xq", h.alias("_h"))
        .orderBy("_h", "id")
        .limit(n_cells)
    )
    # unpartitioned window = SINGLE-partition sort: safe ONLY because
    # `seeds` is already limited to n_cells rows (a TakeOrderedAndProject
    # that merges per-partition top-k on the driver) — do not copy this
    # idiom onto a frame that scales with the corpus
    w = Window.orderBy("_h", "id")
    seed_c = seeds.select(
        (F.row_number().over(w) - 1).cast("int").alias("cell"),
        F.col("xq").alias("cq"),
    )

    def assign_to(centroids: DataFrame) -> DataFrame:
        scored = q.crossJoin(F.broadcast(centroids)).select(
            "id",
            "cell",
            _cell_score(F.col("xq"), F.col("cq")).alias("s"),
        )
        return scored.groupBy("id").agg(
            F.max_by("cell", F.struct(F.col("s"), -F.col("cell"))).alias("cell")
        )

    a0 = assign_to(seed_c)
    # Lloyd step: exact integer component sums per cell, floor-mean
    # normalized (cq = ⌊Σx / n⌋ via the pmod identity, pure integer-valued
    # double ops identical in any engine) so every later dot-product
    # addend stays an exact integer < 2^53 — a raw component SUM would
    # overflow exactness at |cell| ≫ 1 and make fold order observable.
    # Components reassembled in order via sort_array on (j, mean) structs.
    comp = (
        q.join(a0, "id")
        .select("cell", F.posexplode("xq").alias("j", "x"))
        .groupBy("cell", "j")
        .agg(F.sum("x").alias("cs"), F.count("*").alias("cn"))
    )
    fmean = (
        F.col("cs") - (((F.col("cs") % F.col("cn")) + F.col("cn")) % F.col("cn"))
    ) / F.col("cn")
    cent = (
        comp.select("cell", "j", fmean.alias("cm"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("j", "cm"))), lambda s: s["cm"]
            ).alias("cq")
        )
    )
    # materialize the quantizer ONCE: cent is n_cells × dim (broadcast-
    # sized), but its lineage is two full corpus passes (seed selection +
    # Lloyd agg) — without the persist every downstream consumer (assign,
    # probe scoring, candidate joins) re-executes that lineage from scratch.
    cent = cent.persist()
    cent.count()
    return assign_to(cent), cent


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """[query_id, neighbor_id, cosine, rank] — IVF approximate top-k: each
    query probes its ``n_probe`` best cells of the coarse quantizer
    (:func:`ivf_cells`); candidates are the vectors ASSIGNED to a probed
    cell; exact cosine + ranking only within candidates.

    The second scale path next to :func:`lsh_topk` (FAISS-style IVF-Flat
    re-expressed as DataFrame ops): candidate count is
    O(N · n_probe / n_cells) per query on balanced cells — tune
    ``n_cells ≈ √N`` and ``n_probe`` for the recall target.  The centroid
    table broadcasts (n_cells × dim); the probe join shuffles only
    (query, cell) pairs, never vectors.
    """
    _, cent = ivf_cells(emb, n_cells, id_col, vec_col)
    q = _quantized(emb, id_col, vec_col)
    # ONE scoring pass over the corpus serves both roles: rank 1 per id is
    # its cell ASSIGNMENT (same argmax/tie-break as ivf_cells' assign —
    # s desc, cell asc), ranks 1..n_probe are its PROBE list.  Persisted so
    # the probe side and the candidate-join side don't each rescan the
    # corpus against the (already persisted) centroids.
    wp = Window.partitionBy("id").orderBy(F.col("s").desc(), F.col("cell").asc())
    ranked = (
        q.crossJoin(F.broadcast(cent))
        .select("id", "cell", _cell_score(F.col("xq"), F.col("cq")).alias("s"))
        .withColumn("_r", F.row_number().over(wp))
        .filter(F.col("_r") <= max(n_probe, 1))
        .persist()
    )
    probes = ranked.select(F.col("id").alias("query_id"), "cell")
    assign = ranked.filter(F.col("_r") == 1).select("id", "cell")
    cand = (
        probes.join(assign.select(F.col("id").alias("neighbor_id"), "cell"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vec = F.col(vec_col).cast("array<double>")
    base = emb.select(F.col(id_col).alias("id"), vec.alias("v"), _norm(vec).alias("n"))
    sims = (
        cand.join(
            base.select(F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("n").alias("qn")),
            "query_id",
        )
        .join(
            base.select(F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("n").alias("cn")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                round_digits,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank")
        )
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 64,
    n_bands: int = 8,
    probe_bits: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """[query_id, neighbor_id, cosine, rank] — approximate top-k: candidates
    share ≥1 signature band exactly or within Hamming distance
    ``probe_bits`` on the query side (multi-probe: every flip mask of
    weight ≤ probe_bits); exact cosine only within buckets.

    The cross-join of :func:`cosine_topk` is replaced by a bucket equi-join
    — the 100 TB path: candidate count is O(N · bucket_occupancy ·
    Σ_{{d≤probe_bits}} C(rows_per_band, d)), never N².  ``probe_bits=2``
    (default) measures 0.93 recall@5 on clustered 64-dim data where
    distance-1 probing stalls at 0.83; drop to 1 (or 0) to trade recall
    for probe fan-out on very hot corpora.  Band-key space is
    ``2^(n_planes/n_bands)`` per band (default 256); raise ``n_planes``
    with corpus size so occupancy stays bounded, and keep
    :func:`cosine_topk` as the exact recall oracle on samples.
    """
    rows_per_band = n_planes // n_bands
    bands = hyperplane_band_keys(emb, n_planes, n_bands, id_col, vec_col)
    masks = probe_masks(rows_per_band, probe_bits)
    if len(masks) > 1:
        flips = F.array(*[F.lit(m) for m in masks])
        l = bands.select(
            F.col(id_col).alias("query_id"),
            "band",
            F.explode(flips).alias("_f"),
            "bkey",
        ).select(
            "query_id", "band", F.col("bkey").bitwiseXOR(F.col("_f")).alias("bkey")
        )
    else:
        l = bands.select(F.col(id_col).alias("query_id"), "band", "bkey")
    r = bands.select(F.col(id_col).alias("neighbor_id"), "band", "bkey")
    cand = (
        l.join(r, ["band", "bkey"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vec = F.col(vec_col).cast("array<double>")
    base = emb.select(
        F.col(id_col).alias("id"), vec.alias("v"), _norm(vec).alias("n")
    )
    sims = (
        cand.join(
            base.select(
                F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("n").alias("qn")
            ),
            "query_id",
        )
        .join(
            base.select(
                F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("n").alias("cn")
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                round_digits,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int").alias("rank"))
    )
