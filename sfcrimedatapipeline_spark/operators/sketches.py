"""Mergeable sketch operators with gate-exact oracles.

KMV / theta sketches over the portable 60-bit hash space
(functions/hashing.py): a sketch is the K smallest distinct hashes of
a keyed set, θ is the K-th smallest (2^60 when the set fits — the
sketch is then exhaustive and every estimate degrades to the exact
count). Unlike HLL, theta sketches support set INTERSECTION, which is
why audience-overlap / shared-content analysis at 100 TB is a
theta-sketch workload. Estimates are ``count·2^60/θ_pair`` — exact
integers plus one deterministic double multiply/divide, so the
ESTIMATOR ITSELF is value-hash gateable (events_kmv_overlap,
docs_kmv_source_overlap).

Both builders below — the DataFrame pipeline and the SQL-string twin —
derive from the same constants, so the engines cannot drift. At scale:
per-partition min-k states merge associatively (min-k of min-ks), the
pair grid is (#keys)² over per-key AGGREGATES, and the exact-answer
audit columns are the only hash-grain joins (a production run drops
them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: default sketch size (k smallest hash values per keyed set)
KMV_K = 512

#: exhaustive-sketch theta — the 60-bit portable hash space size
KMV_HASH_SPACE = 1 << 60

#: theta-sketch estimator: |X ∩ [0, θ_pair)| · 2^60 / θ_pair
_KMV_EST = (
    "CAST({cnt} AS DOUBLE) * " + repr(float(KMV_HASH_SPACE))
    + " / CAST(theta_pair AS DOUBLE)"
)


def kmv_pair_overlap(uh: DataFrame, key_col: str, k: int = KMV_K) -> DataFrame:
    """Pairwise KMV union/intersection estimates (+ exact audit columns)
    over a DISTINCT ``(key_col, h)`` frame, ``h`` a portable 60-bit
    hash. Returns one row per unordered key pair: ``key_a, key_b,
    n_exact_a, n_exact_b, exact_union, exact_inter, est_union,
    est_inter``."""
    uh = uh.select(F.col(key_col).alias("k_"), "h").distinct()
    w = Window.partitionBy("k_").orderBy(F.col("h").asc())
    sk = (
        uh.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .drop("r")
    )
    n_exact = uh.groupBy("k_").agg(F.count("*").cast("long").alias("n_exact"))
    theta = (
        sk.groupBy("k_")
        .agg(F.max("h").alias("max_h"), F.count("*").cast("long").alias("k_t"))
        .select(
            "k_",
            F.when(F.col("k_t") < k, F.lit(KMV_HASH_SPACE))
            .otherwise(F.col("max_h"))
            .cast("long")
            .alias("theta"),
        )
    )
    a, b = theta.alias("a"), theta.alias("b")
    pairs = a.join(b, F.col("a.k_") < F.col("b.k_"), "inner").select(
        F.col("a.k_").alias("key_a"),
        F.col("b.k_").alias("key_b"),
        F.least(F.col("a.theta"), F.col("b.theta")).alias("theta_pair"),
    )
    na = (
        sk.join(pairs, (sk.k_ == pairs.key_a) & (sk.h < pairs.theta_pair))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").cast("long").alias("n_a_below"))
    )
    nb = (
        sk.join(pairs, (sk.k_ == pairs.key_b) & (sk.h < pairs.theta_pair))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").cast("long").alias("n_b_below"))
    )
    sa, sb = sk.alias("sa"), sk.alias("sb")
    hmatch = sa.join(
        sb, (F.col("sa.h") == F.col("sb.h")) & (F.col("sa.k_") < F.col("sb.k_"))
    ).select(
        F.col("sa.k_").alias("key_a"),
        F.col("sb.k_").alias("key_b"),
        F.col("sa.h").alias("h"),
    )
    ni = (
        hmatch.join(pairs, ["key_a", "key_b"])
        .filter(F.col("h") < F.col("theta_pair"))
        .groupBy("key_a", "key_b")
        .agg(F.count("*").cast("long").alias("n_i_below"))
    )
    ua, ub = uh.alias("ua"), uh.alias("ub")
    xi = (
        ua.join(
            ub,
            (F.col("ua.h") == F.col("ub.h")) & (F.col("ua.k_") < F.col("ub.k_")),
        )
        .groupBy(
            F.col("ua.k_").alias("key_a"), F.col("ub.k_").alias("key_b")
        )
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    base = (
        pairs.join(na, ["key_a", "key_b"], "left")
        .join(nb, ["key_a", "key_b"], "left")
        .join(ni, ["key_a", "key_b"], "left")
        .join(xi, ["key_a", "key_b"], "left")
        .join(
            n_exact.withColumnRenamed("k_", "key_a").withColumnRenamed(
                "n_exact", "n_exact_a"
            ),
            "key_a",
        )
        .join(
            n_exact.withColumnRenamed("k_", "key_b").withColumnRenamed(
                "n_exact", "n_exact_b"
            ),
            "key_b",
        )
        .select(
            "key_a",
            "key_b",
            "n_exact_a",
            "n_exact_b",
            F.coalesce(F.col("n_a_below"), F.lit(0)).cast("long").alias("n_a_below"),
            F.coalesce(F.col("n_b_below"), F.lit(0)).cast("long").alias("n_b_below"),
            F.coalesce(F.col("n_i_below"), F.lit(0)).cast("long").alias("n_i_below"),
            F.coalesce(F.col("exact_inter"), F.lit(0))
            .cast("long")
            .alias("exact_inter"),
            "theta_pair",
        )
    )
    return base.select(
        "key_a",
        "key_b",
        "n_exact_a",
        "n_exact_b",
        (F.col("n_exact_a") + F.col("n_exact_b") - F.col("exact_inter"))
        .cast("long")
        .alias("exact_union"),
        "exact_inter",
        F.expr(_KMV_EST.format(cnt="(n_a_below + n_b_below) - n_i_below")).alias(
            "est_union"
        ),
        F.expr(_KMV_EST.format(cnt="n_i_below")).alias("est_inter"),
    )


def sql_kmv_pair_overlap(uh_sql: str, k: int = KMV_K) -> str:
    """DuckDB twin of :func:`kmv_pair_overlap`. ``uh_sql`` must be a
    SELECT producing DISTINCT rows ``(k_, h)``. Constants interpolated
    from the same module variables as the Spark side."""
    two60 = repr(float(KMV_HASH_SPACE))
    return f"""
    WITH uh AS (
        {uh_sql}
    ),
    sk AS (
        SELECT k_, h
        FROM (
            SELECT k_, h,
                   row_number() OVER (PARTITION BY k_ ORDER BY h ASC) AS r
            FROM uh
        )
        WHERE r <= {k}
    ),
    n_exact AS (
        SELECT k_, CAST(count(*) AS BIGINT) AS n_exact FROM uh GROUP BY 1
    ),
    theta AS (
        SELECT k_,
               CAST(CASE WHEN count(*) < {k} THEN {KMV_HASH_SPACE}
                         ELSE max(h) END AS BIGINT) AS theta
        FROM sk GROUP BY 1
    ),
    pairs AS (
        SELECT a.k_ AS key_a, b.k_ AS key_b,
               least(a.theta, b.theta) AS theta_pair
        FROM theta a JOIN theta b ON a.k_ < b.k_
    ),
    na AS (
        SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS n_a_below
        FROM sk JOIN pairs ON sk.k_ = pairs.key_a
                          AND sk.h < pairs.theta_pair
        GROUP BY 1, 2
    ),
    nb AS (
        SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS n_b_below
        FROM sk JOIN pairs ON sk.k_ = pairs.key_b
                          AND sk.h < pairs.theta_pair
        GROUP BY 1, 2
    ),
    ni AS (
        SELECT p.key_a, p.key_b, CAST(count(*) AS BIGINT) AS n_i_below
        FROM sk sa
        JOIN sk sb ON sa.h = sb.h AND sa.k_ < sb.k_
        JOIN pairs p ON p.key_a = sa.k_ AND p.key_b = sb.k_
        WHERE sa.h < p.theta_pair
        GROUP BY 1, 2
    ),
    xi AS (
        SELECT ua.k_ AS key_a, ub.k_ AS key_b,
               CAST(count(*) AS BIGINT) AS exact_inter
        FROM uh ua
        JOIN uh ub ON ua.h = ub.h AND ua.k_ < ub.k_
        GROUP BY 1, 2
    ),
    base AS (
        SELECT pairs.key_a, pairs.key_b,
               ea.n_exact AS n_exact_a,
               eb.n_exact AS n_exact_b,
               CAST(coalesce(na.n_a_below, 0) AS BIGINT) AS n_a_below,
               CAST(coalesce(nb.n_b_below, 0) AS BIGINT) AS n_b_below,
               CAST(coalesce(ni.n_i_below, 0) AS BIGINT) AS n_i_below,
               CAST(coalesce(xi.exact_inter, 0) AS BIGINT) AS exact_inter,
               pairs.theta_pair
        FROM pairs
        LEFT JOIN na USING (key_a, key_b)
        LEFT JOIN nb USING (key_a, key_b)
        LEFT JOIN ni USING (key_a, key_b)
        LEFT JOIN xi USING (key_a, key_b)
        JOIN n_exact ea ON ea.k_ = pairs.key_a
        JOIN n_exact eb ON eb.k_ = pairs.key_b
    )
    SELECT key_a, key_b, n_exact_a, n_exact_b,
           CAST(n_exact_a + n_exact_b - exact_inter AS BIGINT) AS exact_union,
           exact_inter,
           CAST((n_a_below + n_b_below) - n_i_below AS DOUBLE)
               * {two60} / CAST(theta_pair AS DOUBLE)
               AS est_union,
           CAST(n_i_below AS DOUBLE)
               * {two60} / CAST(theta_pair AS DOUBLE)
               AS est_inter
    FROM base
"""
