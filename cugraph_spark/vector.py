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


def hyperplane_signatures(
    emb: DataFrame,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[vec_id, sig] — random-hyperplane (SimHash-for-vectors) signature.

    Plane components are deterministic ±1 from modular arithmetic:
    ``sign(i, j) = +1 if ((a·(i·dim + j) + b) mod p) is odd else −1`` —
    reproducible in any engine, no stored plane matrix, no RNG state.
    """
    a_, b_ = 1299721, 15485863
    vec = F.col(vec_col).cast("array<double>")
    ed = emb.select(
        F.col(id_col), F.posexplode(vec).alias("j", "x")
    )
    dim = F.size(vec)
    # one row per (vec, plane): sum of ±x over components
    planes = ed.select(
        id_col,
        "j",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("pi"),
    )
    idx = (F.col("pi") * F.lit(4096) + F.col("j")).cast("long")
    sgn = F.when(
        ((F.lit(a_) * (idx % F.lit(P)) + F.lit(b_)) % F.lit(P)) % 2 == 1, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    proj = (
        planes.withColumn("_t", sgn * F.col("x"))
        .groupBy(id_col, "pi")
        .agg(F.sum("_t").alias("dot"))
    )
    bit = F.when(F.col("dot") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
    # shiftleft's python wrapper wants an int literal; the SQL form takes a col
    pow2 = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pi AS INT))")
    return (
        proj.withColumn("_b", bit * pow2)
        .groupBy(id_col)
        .agg(F.sum("_b").alias("sig"))
    )


def lsh_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 4,
) -> DataFrame:
    """[query_id, neighbor_id, cosine, rank] — approximate top-k: candidates
    share ≥1 signature band; exact cosine only within buckets. The
    cross-join of :func:`cosine_topk` is replaced by a bucket equi-join —
    the 100 TB path (candidate count scales with bucket occupancy, not V²)."""
    rows_per_band = n_planes // n_bands
    sig = hyperplane_signatures(emb, n_planes, id_col, vec_col)
    mask = (1 << rows_per_band) - 1
    bands = None
    for bi in range(n_bands):
        part = sig.select(
            id_col,
            F.lit(bi).alias("band"),
            F.shiftright(F.col("sig"), bi * rows_per_band)
            .bitwiseAND(F.lit(mask))
            .alias("bkey"),
        )
        bands = part if bands is None else bands.union(part)
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
