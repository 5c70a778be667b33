"""Similarity search over embedding columns: exact brute-force top-k
(the correctness baseline) and an LSH-bucketed approximate variant (the
scale path).

Brute force broadcasts the query set and scans the corpus once —
correct at any corpus size as long as the QUERY set is broadcastable;
cost is O(|corpus| × |queries|) fused in codegen, then a per-query
top-k window on a (corpus→queries)-sized intermediate. The LSH variant
bounds that intermediate by only scoring within random-hyperplane
buckets, trading recall for a ~bucket-fraction of the work — the same
probe pattern an IVF index gives, without a side index structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.functions.hashing import portable_hash64
from sfcrimedatapipeline_spark.functions.vectors import cosine_fixed, norm_fixed

DEFAULT_DIM = 64


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Deterministic ranking: (cosine DESC, neighbor id ASC) — ties cannot
    reorder across engines. Norms are computed once per vector on each
    side; the per-pair work is a single unrolled codegen dot product.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm_fixed(F.col(vec_col), dim).alias("qn"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_fixed(F.col(vec_col), dim).alias("cn"),
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_fixed(F.col("qv"), F.col("cv"), dim, F.col("qn"), F.col("cn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cosine")
    )


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from the portable-hash
    formula (driver-side constant, broadcast with the plan)."""
    import hashlib

    return [
        int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:8], 16) / 0x7FFFFFFF - 1.0
        for d in range(dim)
    ]


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Random-hyperplane signature: one sign bit per plane.

    Kept as the HOF ``aggregate`` fold DELIBERATELY: unrolling each
    projection into a flat ``vec[i] * <literal>`` sum (the
    ``dot_fixed`` pattern) was tried and MEASURED 4x SLOWER at sf0.1
    (ann_cosine_topk_lsh 2.4 s → 9.5 s, emb_near_duplicates_lsh
    0.85 s → 3.0 s, 3-rep medians): 6 planes × 64 terms = 384-term
    expression trees per row blow past the whole-stage-codegen method
    budget and drop the operator to interpreted eval — the opposite of
    the scoring path, where ONE 64-term dot per pair fits codegen and
    the unroll wins an order of magnitude. Projection cost here is
    per-row linear, not per-pair, so the interpreted HOF is not the
    bottleneck at any scale.
    """
    bits = []
    for p_idx, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.lit(plane).cast("array<double>"),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append((proj >= 0).cast("int") * F.lit(2**p_idx))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's LSH
    bucket. Equi-join on the bucket key instead of a cross join — the
    100 TB shape (hash-partitioned, AQE-skew-safe). Recall is tunable
    via n_planes (fewer planes → bigger buckets → higher recall)."""
    planes = [_hyperplane(dim, p) for p in range(n_planes)]
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            norm_fixed(F.col(vec_col), dim).alias("qn"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_fixed(F.col(vec_col), dim).alias("cn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_fixed(F.col("qv"), F.col("cv"), dim, F.col("qn"), F.col("cn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cosine")
    )
