"""Deterministic distributed model training — gradient descent whose
trace is bit-reproducible across Spark, DuckDB, and driver Python.

The classic objection to training INSIDE a data engine is that the
result is not reproducible: float gradient sums depend on partition
order, and sigmoid/exp differ between libms. Both objections fall to
the repo's determinism primitives:

- gradients are Q40 fixed-point sums (functions/fixedpoint.py) —
  exact DECIMAL(38,0) integers, any aggregation order, any partition
  count;
- the sigmoid rides ``exp_det`` (functions/detmath.py) — the
  squaring-chain exp built only from IEEE-correctly-rounded ops,
  bit-identical on every engine;
- weight updates are plain scalar IEEE double math, repeated textually
  in the DuckDB oracle's recursive CTE and in the driver loop here.

By induction over iterations the weight trace is IDENTICAL in all
three implementations — which is why the ``docs_logreg_train`` query
(plans/infotheory.py) can be VALUE-HASH gated against a recursive-CTE
SQL oracle: the first gated in-engine trainer in this repo.

Scale (100 TB): each iteration is ONE map-side-combinable aggregate
over the cached feature frame — F+1 fixed-point sums (F features + the
count) shuffle F+1 scalars total; the driver holds only the weight
vector. This is textbook full-batch distributed GD; iterations
serialize (inherent to GD), everything inside an iteration is one
whole-stage-codegen pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.functions.detmath import exp_det_py, with_exp_det
from sfcrimedatapipeline_spark.functions.fixedpoint import FX_SCALE, sql_fx


def logreg_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int,
    lr: float,
) -> list[tuple]:
    """Full-batch logistic-regression GD over a feature frame.

    Returns the weight TRACE ``[(it, w_0..w_F), ...]`` for it = 0..iters
    (it=0 is the zero seed) — the value the gated query materializes as
    a literal frame. ``feats`` must expose ``feature_cols`` and a 0/1
    double ``label_col``; it is cached for the duration (iters passes)
    and unpersisted before returning."""
    feats = feats.cache()
    n = feats.count()
    w = [0.0] * len(feature_cols)
    trace: list[tuple] = [(0, *w)]
    for it in range(1, iters + 1):
        # z with the current weights embedded as full-precision literals
        # (repr round-trips the double; both engines parse it back to
        # the same value — the oracle's recursive CTE carries w as
        # columns instead, same arithmetic text)
        z = " + ".join(
            f"CAST({w[j]!r} AS DOUBLE) * {c}"
            for j, c in enumerate(feature_cols)
        )
        d = feats.withColumn("nz", F.expr(f"0.0 - ({z})"))
        d = with_exp_det(d, "nz", "enz")
        d = d.withColumn("sig", F.expr("1.0 / (1.0 + enz)"))
        grads = d.agg(
            *[
                F.sum(F.expr(sql_fx(f"{c} * ({label_col} - sig)"))).alias(
                    f"g{j}"
                )
                for j, c in enumerate(feature_cols)
            ]
        ).collect()[0]
        # update arithmetic mirrored TEXTUALLY by the oracle:
        # w' = w + lr * ((unfx(g) ) / n)
        w = [
            w[j] + lr * ((float(grads[f"g{j}"]) / FX_SCALE) / n)
            for j in range(len(feature_cols))
        ]
        trace.append((it, *w))
    feats.unpersist()
    return trace


def logreg_train_py(
    rows: list[tuple],
    iters: int,
    lr: float,
) -> list[tuple]:
    """Bit-exact Python twin of :func:`logreg_train` for parity tests:
    ``rows`` is ``[(y, x_0..x_F), ...]``. Every operation sequence
    matches the engine path (fx floor-quantization, exp_det sigmoid,
    identical update order), so the traces must be EQUAL, not close."""
    import math

    nf = len(rows[0]) - 1
    n = len(rows)
    w = [0.0] * nf
    trace: list[tuple] = [(0, *w)]
    for it in range(1, iters + 1):
        g = [0] * nf
        for row in rows:
            y, xs = row[0], row[1:]
            # left-associated exactly like the SQL text `w0*x0 + w1*x1
            # + ...` (no leading 0.0+ term — keeps ±0 edge cases
            # bit-identical)
            z = w[0] * xs[0]
            for j in range(1, nf):
                z = z + w[j] * xs[j]
            sig = 1.0 / (1.0 + exp_det_py(0.0 - z))
            for j in range(nf):
                g[j] += math.floor((xs[j] * (y - sig)) * FX_SCALE)
        w = [w[j] + lr * ((float(g[j]) / FX_SCALE) / n) for j in range(nf)]
        trace.append((it, *w))
    return trace


# ---------------------------------------------------------------------------
# deterministic k-means (Lloyd's) — the gated IVF-quantizer trainer
# ---------------------------------------------------------------------------


def kmeans_train(
    emb: DataFrame,
    k: int,
    iters: int,
) -> list[tuple]:
    """Full-batch Lloyd's k-means over an ``(vec_id, embedding)`` frame,
    deterministic to the bit: init is the k smallest vec_ids' vectors;
    per-point distances are Q40 fixed-point sums at the (vec, cluster)
    grain (so the argmin is an exact-integer comparison, tie-broken on
    cluster id); new centroids are fixed-point means. Returns final
    centroid rows ``[(cluster, n_members, dim, centroid), ...]`` —
    k·dims rows — exactly reproducible by the DuckDB unrolled-CTE
    oracle and any partitioning.

    Scale (100 TB): per iteration, one broadcast of k·dims centroid
    cells into the exploded point grain, one (vec, cluster) distance
    aggregate (map-side combinable), one (cluster, dim) mean aggregate.
    Centroids collect to the driver between iterations (k·dims values —
    the BPE/IVF trainer precedent); empty clusters keep their previous
    centroid (COALESCE, mirrored in the oracle)."""
    from sfcrimedatapipeline_spark.functions.fixedpoint import FX_SCALE, sql_fx

    spark = emb.sparkSession
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val_f")
    ).select(
        "vec_id",
        (F.col("pos") + F.lit(1)).alias("dim"),
        F.col("val_f").cast("double").alias("val"),
    )
    pts = pts.cache()
    # deterministic init: the k smallest vec_ids, cluster = their rank
    init_ids = [
        r["vec_id"]
        for r in emb.select("vec_id").orderBy("vec_id").limit(k).collect()
    ]
    rank = {vid: c for c, vid in enumerate(init_ids)}
    cent: list[tuple] = [
        (rank[r["vec_id"]], 0, r["dim"], r["val"])
        for r in pts.filter(F.col("vec_id").isin(init_ids)).collect()
    ]
    for _ in range(iters):
        cdf = F.broadcast(
            spark.createDataFrame(
                [(c, d, v) for (c, _, d, v) in cent],
                "cluster bigint, dim int, cval double",
            )
        )
        dist = (
            pts.join(cdf, "dim")
            .groupBy("vec_id", "cluster")
            .agg(
                F.sum(F.expr(sql_fx("(val - cval) * (val - cval)"))).alias(
                    "dist_fx"
                )
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("vec_id").orderBy(
            F.col("dist_fx").asc(), F.col("cluster").asc()
        )
        assign = (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster")
        )
        means = (
            assign.join(pts, "vec_id")
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.expr(sql_fx("val"))).alias("s_fx"),
                F.count("*").cast("long").alias("n"),
            )
            .collect()
        )
        got = {
            (r["cluster"], r["dim"]): (
                (float(r["s_fx"]) / FX_SCALE) / r["n"],
                r["n"],
            )
            for r in means
        }
        # empty clusters keep the previous centroid (n = 0)
        cent = [
            (c, got[(c, d)][1], d, got[(c, d)][0])
            if (c, d) in got
            else (c, 0, d, v)
            for (c, _, d, v) in cent
        ]
    pts.unpersist()
    return cent


# ---------------------------------------------------------------------------
# deterministic power iteration — the gated PCA/top-eigenvector trainer
# ---------------------------------------------------------------------------


def power_iteration(
    emb: DataFrame,
    iters: int,
    dims: int,
) -> tuple[list[float], float]:
    """Top eigenvector of the (uncentered) Gram matrix XᵀX by power
    iteration, deterministic to the bit: matrix-vector products are Q40
    fixed-point sums at the vec / dim grains, the norm is a fixed-point
    sum over the dim grain, and the normalize step is one IEEE
    sqrt + divide. Returns ``(v, eigenvalue)`` with ``v`` the unit
    loading vector after ``iters`` rounds and ``eigenvalue ≈ ‖XᵀXv‖``.

    The init is the exact uniform unit vector (1/√dims must be a power
    of two — asserted — so the literal is exact). Scale (100 TB): per
    iteration, one dims-cell broadcast, one vec-grain aggregate, one
    dim-grain aggregate — the driver holds only the 64 loadings
    (BPE-trainer precedent)."""
    import math

    from sfcrimedatapipeline_spark.functions.fixedpoint import FX_SCALE, sql_fx

    spark = emb.sparkSession
    lg = int(round(math.log2(dims)))
    assert (1 << lg) == dims and lg % 2 == 0, (
        "dims must be an even power of two so 1/sqrt(dims) is exact"
    )
    init = 1.0 / float(1 << (lg // 2))
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val_f")
    ).select(
        "vec_id",
        (F.col("pos") + F.lit(1)).alias("dim"),
        F.col("val_f").cast("double").alias("val"),
    )
    pts = pts.cache()
    v = [init] * dims
    norm2 = 1.0
    for _ in range(iters):
        vdf = F.broadcast(
            spark.createDataFrame(
                [(d + 1, v[d]) for d in range(dims)], "dim int, vval double"
            )
        )
        u = (
            pts.join(vdf, "dim")
            .groupBy("vec_id")
            .agg(F.sum(F.expr(sql_fx("val * vval"))).alias("u_fx"))
            .select(
                "vec_id",
                (F.col("u_fx").cast("double") / F.lit(FX_SCALE)).alias("uval"),
            )
        )
        w_rows = (
            pts.join(u, "vec_id")
            .groupBy("dim")
            .agg(F.sum(F.expr(sql_fx("val * uval"))).alias("w_fx"))
            .collect()
        )
        w = [0.0] * dims
        for r in w_rows:
            w[r["dim"] - 1] = float(r["w_fx"]) / FX_SCALE
        # norm² as the same fixed-point sum the oracle runs on its dim
        # rows (python ints are exact)
        norm2 = float(sum(math.floor((wd * wd) * FX_SCALE) for wd in w)) / FX_SCALE
        s = math.sqrt(norm2)
        v = [wd / s for wd in w]
    pts.unpersist()
    return v, math.sqrt(norm2)


# ---------------------------------------------------------------------------
# deterministic spherical k-means — the gated trained-IVF quantizer
# ---------------------------------------------------------------------------


def spherical_kmeans_det(
    emb: DataFrame,
    k: int,
    iters: int,
) -> list[tuple[int, list[float]]]:
    """Spherical k-means (cosine assignment, unnormalized means — the
    train_ivf_centroids semantics) made bit-deterministic: vector and
    centroid norms are fixed-point sums, assignments are argmax over
    exact fixed-point dot integers (ties → lowest centroid id), and
    means divide fixed-point sums — so the trained centroids are
    identical across partitionings AND engines, which is what upgrades
    ``ann_cosine_topk_ivf_trained`` from rows-only to value-hash gated
    (its old rationale: "trained float centroids are not
    engine-reproducible by design").

    Returns ``[(centroid_id, vector), ...]`` in the
    :func:`~sfcrimedatapipeline_spark.operators.similarity.cosine_topk_ivf`
    input shape (centroid ids 0..k-1). Scale: per iteration one k·dims
    broadcast, one (vec, cid) dot aggregate, one (cid, dim) mean
    aggregate — all map-side combinable; zero-norm vectors divide by
    1.0 (the numpy trainer's vn[vn==0]=1 rule)."""
    import math

    from sfcrimedatapipeline_spark.functions.fixedpoint import (
        FX_SCALE,
        sql_fx,
        sql_unfx,
    )

    spark = emb.sparkSession
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val_f")
    ).select(
        "vec_id",
        (F.col("pos") + F.lit(1)).alias("dim"),
        F.col("val_f").cast("double").alias("val"),
    )
    norm_fx = sql_unfx(f"sum({sql_fx('val * val')})")
    nv = pts.groupBy("vec_id").agg(F.expr(f"sqrt({norm_fx})").alias("nv"))
    ph = (
        pts.join(nv, "vec_id")
        .select(
            "vec_id",
            "dim",
            "val",
            F.expr(
                "val / (CASE WHEN nv = 0.0 THEN 1.0 ELSE nv END)"
            ).alias("valh"),
        )
        .cache()
    )
    ph.count()
    seeds = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    )
    cent: list[list[float]] = [
        [float(x) for x in r["embedding"]] for r in seeds
    ]
    dims = len(cent[0])
    for _ in range(iters):
        # centroid norms with the same fx discipline, driver-side
        # (python ints are exact — mirrors the oracle's per-cid fx sum)
        ch_rows = []
        for cid, cv in enumerate(cent):
            nc = math.sqrt(
                float(sum(math.floor((x * x) * FX_SCALE) for x in cv))
                / FX_SCALE
            )
            div = 1.0 if nc == 0.0 else nc
            for d in range(dims):
                ch_rows.append((cid, d + 1, cv[d] / div))
        cdf = F.broadcast(
            spark.createDataFrame(ch_rows, "cid bigint, dim int, cvalh double")
        )
        dots = (
            ph.join(cdf, "dim")
            .groupBy("vec_id", "cid")
            .agg(F.sum(F.expr(sql_fx("valh * cvalh"))).alias("dot_fx"))
        )
        from pyspark.sql import Window

        w = Window.partitionBy("vec_id").orderBy(
            F.col("dot_fx").desc(), F.col("cid").asc()
        )
        assign = (
            dots.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid")
        )
        means = (
            assign.join(ph, "vec_id")
            .groupBy("cid", "dim")
            .agg(
                F.expr(
                    sql_unfx(f"sum({sql_fx('val')})")
                    + " / CAST(count(*) AS DOUBLE)"
                ).alias("mval")
            )
            .collect()
        )
        got = {(r["cid"], r["dim"]): r["mval"] for r in means}
        cent = [
            [
                got.get((cid, d + 1), cent[cid][d])
                for d in range(dims)
            ]
            for cid in range(k)
        ]
    ph.unpersist()
    return [(cid, cent[cid]) for cid in range(k)]


# ---------------------------------------------------------------------------
# deterministic per-subspace k-means — the gated trained-PQ codebooks
# ---------------------------------------------------------------------------


def pq_kmeans_det(
    emb: DataFrame,
    m: int,
    n_codes: int,
    iters: int,
    dims: int = 64,
) -> list[list[list[float]]]:
    """Per-subspace squared-L2 k-means (the train_pq_codebooks
    semantics) made bit-deterministic: distances are fixed-point sums
    within each subspace (argmin = exact integer compare, ties → lowest
    code id), means are fixed-point sums over assigned members, empty
    codes keep their previous centroid, seeds are the lowest-
    ``n_codes`` vectors' subvectors. Returns ``codebooks[s][c]`` in the
    :func:`~sfcrimedatapipeline_spark.operators.similarity.pq_topk`
    input shape — identical across partitionings AND engines, which is
    what upgrades ``ann_pq_topk_trained`` from rows-only to value-hash
    gated. All ``m`` subspaces train in the same distributed passes
    (the subspace id is just another grouping column)."""
    from sfcrimedatapipeline_spark.functions.fixedpoint import sql_fx, sql_unfx

    spark = emb.sparkSession
    sub = dims // m
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val_f")
    ).select(
        "vec_id",
        (F.col("pos") + F.lit(1)).alias("dim"),
        (F.col("pos") / F.lit(sub)).cast("int").alias("s"),
        F.col("val_f").cast("double").alias("val"),
    )
    pts = pts.cache()
    seeds = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(n_codes).collect()
    )
    # cb[(cid, dim1based)] = value — full-vector layout; the m×k×sub
    # nesting is re-sliced only at return time
    cb: dict[tuple[int, int], float] = {}
    for cid, r in enumerate(seeds):
        for d, x in enumerate(r["embedding"]):
            cb[(cid, d + 1)] = float(x)
    for _ in range(iters):
        cdf = F.broadcast(
            spark.createDataFrame(
                [(cid, d, v) for (cid, d), v in cb.items()],
                "cid bigint, dim int, cval double",
            )
        )
        dist = (
            pts.join(cdf, "dim")
            .groupBy("vec_id", "s", "cid")
            .agg(
                F.sum(F.expr(sql_fx("(val - cval) * (val - cval)"))).alias(
                    "dist_fx"
                )
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy("vec_id", "s").orderBy(
            F.col("dist_fx").asc(), F.col("cid").asc()
        )
        assign = (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "s", "cid")
        )
        means = (
            assign.join(pts, ["vec_id", "s"])
            .groupBy("cid", "dim")
            .agg(
                F.expr(
                    sql_unfx(f"sum({sql_fx('val')})")
                    + " / CAST(count(*) AS DOUBLE)"
                ).alias("mval")
            )
            .collect()
        )
        got = {(r["cid"], r["dim"]): r["mval"] for r in means}
        cb = {key: got.get(key, v) for key, v in cb.items()}
    pts.unpersist()
    return [
        [
            [cb[(cid, s * sub + d + 1)] for d in range(sub)]
            for cid in range(n_codes)
        ]
        for s in range(m)
    ]


# ---------------------------------------------------------------------------
# deterministic MMR — the gated diversity re-ranker
# ---------------------------------------------------------------------------


def mmr_rerank_det(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    lamb: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR (λ·relevance − (1−λ)·max_cosine_to_picked) made
    gate-deterministic: pairwise cosines are SEQUENTIAL left-fold
    dot/norm arithmetic — the exact operation order of the oracle's
    ``list_sum`` fragments — instead of numpy BLAS (whose pairwise
    summation differs in the last ulp and can flip greedy picks), and
    the (1−λ) complement is shared with the oracle via ``repr``
    (Python ``1.0−0.7`` is 0.30000000000000004, not the double the SQL
    decimal would produce). Candidates are the ANN top-N (bounded by
    contract — tens of rows per query), so the greedy loop is
    driver-side on the collected candidate set, like every trainer in
    this module; ties break to the smaller neighbor id."""
    import math

    spark = candidates.sparkSession
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    )
    rows = (
        candidates.join(vecs, "neighbor_id")
        .select("query_id", "neighbor_id", "cosine", "__nv")
        .collect()
    )
    om = 1.0 - lamb

    def fold_dot(a: list[float], b: list[float]) -> float:
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def cos_raw(a: list[float], b: list[float]) -> float:
        return fold_dot(a, b) / (
            math.sqrt(fold_dot(a, a)) * math.sqrt(fold_dot(b, b))
        )

    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], float(r["cosine"]), [float(x) for x in r["__nv"]])
        )
    out: list[tuple] = []
    for qid in sorted(by_q):
        cands = sorted(by_q[qid])  # neighbor_id ascending — the tie rule
        picked: list[tuple] = []
        for rank in range(1, min(k, len(cands)) + 1):
            best = None
            for nid, rel, v in cands:
                if any(nid == p[0] for p in picked):
                    continue
                pen = (
                    max(cos_raw(v, p[2]) for p in picked) if picked else 0.0
                )
                score = lamb * rel - om * pen
                if best is None or score > best[0]:
                    best = (score, nid, rel, v)
            out.append((qid, rank, best[1], best[2], best[0]))
            picked.append((best[1], best[2], best[3]))
    return spark.createDataFrame(
        out,
        "query_id long, rank int, neighbor_id long, relevance double, "
        "mmr_score double",
    )
