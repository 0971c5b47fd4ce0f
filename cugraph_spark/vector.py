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
