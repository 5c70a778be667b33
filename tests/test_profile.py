"""frequent_items_mg: Misra-Gries candidate generation + exact
recount — exactness and the survival guarantee under skew."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_mg_matches_exact_on_small_domain(spark):
    from sfcrimedatapipeline_spark.operators.profile import (
        frequent_items,
        frequent_items_mg,
    )

    df = spark.createDataFrame(
        [(v, w) for v in ["a", "a", "a", "b", "b", "c", None] for w in [1, 2]],
        "x string, y int",
    ).repartition(4)
    exact = [tuple(r) for r in frequent_items(df, ["x", "y"], k=3).collect()]
    mg = [tuple(r) for r in frequent_items_mg(df, ["x", "y"], k=3).collect()]
    assert sorted(mg) == sorted(exact)
    # NULL is profiled as the literal string
    assert any(r[1] == "NULL" for r in mg)


def test_mg_heavy_hitter_survives_high_cardinality_tail(spark):
    """10k distinct tail values + one value at 8% frequency: with
    capacity 64 (> 1/0.08) the hitter MUST survive candidate
    generation and report its EXACT count, even though the tail
    overflows every partition's counter budget."""
    from sfcrimedatapipeline_spark.operators.profile import frequent_items_mg

    n_tail, n_heavy = 10_000, 900
    rows = [(f"tail_{i}",) for i in range(n_tail)] + [("HOT",)] * n_heavy
    df = spark.createDataFrame(rows, "k string").repartition(8)
    out = frequent_items_mg(df, ["k"], k=1, capacity=64).collect()
    assert len(out) == 1
    assert out[0].value == "HOT"
    assert out[0].n == n_heavy  # recount is exact, not the MG estimate
    assert out[0].rank == 1


def test_robust_outliers_mad(spark):
    """MAD flags the spike a z-score would hide: one 10^6 outlier in a
    tight group inflates stddev past the 3-sigma bar (z ≈ sqrt(n) at
    best) but leaves the median/MAD untouched. Lower-median rank
    semantics and the exact flag boundary are pinned."""
    from pyspark.sql import functions as F

    from sfcrimedatapipeline_spark.operators.profile import robust_outliers_mad

    rows = (
        [("a", i, 100 + (i % 5)) for i in range(20)]  # tight: med=102, mad<=2
        + [("a", 99, 1_000_000)]  # the spike
        + [("b", 0, 10), ("b", 1, 20), ("b", 2, 30)]  # mad=10, no outlier at c=5
    )
    df = spark.createDataFrame(rows, "g string, id long, v long")
    got = robust_outliers_mad(df, "g", F.col("v"), ["id"], c=5).collect()
    assert [(r.g, r.id, r.value_cents) for r in got] == [("a", 99, 1_000_000)]
    r = got[0]
    # lower median of a's 21 values (102 at rank 11), mad from |v-102|
    assert r.median_cents == 102
    assert r.mad_cents == 1

    # z-score contrast: the spike's z is under 4.6 (sqrt(21)) — a
    # 5-sigma rule would MISS it, while every inlier's MAD dev is <= 2
    import statistics

    vals = [v for g, _, v in rows if g == "a"]
    z = (1_000_000 - statistics.mean(vals)) / statistics.pstdev(vals)
    assert z < 5


def test_cms_overestimates_and_wide_sketch_is_exact(spark):
    """CMS point estimates never undercount; with width >> distinct
    keys and 4 independent rows, the min-over-rows estimate is exact
    for every key on this 20-key domain."""
    from pyspark.sql import functions as F

    from sfcrimedatapipeline_spark.operators.profile import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.range(2000).select((F.col("id") % 20).alias("k"))
    exact = {r["k"]: r["n"] for r in df.groupBy("k").count().withColumnRenamed("count", "n").collect()}
    keys = df.select("k").distinct()

    wide = cms_estimate(cms_sketch(df, "k", 4096, 4, "t"), keys, "k", 4096, 4, "t")
    for r in wide.collect():
        assert r["cms_estimate"] == exact[r["k"]]

    narrow = cms_estimate(cms_sketch(df, "k", 8, 2, "t"), keys, "k", 8, 2, "t")
    for r in narrow.collect():
        assert r["cms_estimate"] >= exact[r["k"]]


def test_cms_sketches_merge_by_counter_addition(spark):
    """The mergeability contract: sketch(A) ⊎ sketch(B) (union +
    groupBy-sum of counters) equals sketch(A ∪ B) row for row —
    what lets per-shard sketches combine without re-reading shards."""
    from pyspark.sql import functions as F

    from sfcrimedatapipeline_spark.operators.profile import cms_sketch

    a = spark.range(0, 500).select((F.col("id") % 13).alias("k"))
    b = spark.range(500, 1300).select((F.col("id") % 7).alias("k"))
    merged = (
        cms_sketch(a, "k", 64, 3, "m")
        .unionByName(cms_sketch(b, "k", 64, 3, "m"))
        .groupBy("i", "bucket")
        .agg(F.sum("c").alias("c_merged"))
    )
    whole = cms_sketch(a.unionByName(b), "k", 64, 3, "m").withColumnRenamed(
        "c", "c_whole"
    )
    diff = merged.join(whole, ["i", "bucket"], "full").filter(
        F.col("c_merged").isNull()
        | F.col("c_whole").isNull()
        | (F.col("c_merged") != F.col("c_whole"))
    )
    assert diff.count() == 0


def test_roc_auc_known_values(spark):
    from sfcrimedatapipeline_spark.operators.profile import roc_auc

    # perfect separation → AUC 1.0
    perfect = spark.createDataFrame(
        [(1, False), (2, False), (3, True), (4, True)],
        "score long, label boolean",
    )
    row = roc_auc(perfect, "score", "label").collect()[0]
    assert row.n_pos == 2 and row.n_neg == 2 and row.auc == 1.0

    # tie case: pos {2,3}, neg {1,2} → (1 + 0.5 + 1 + 1)/4 = 0.875
    tied = spark.createDataFrame(
        [(1, False), (2, False), (2, True), (3, True)],
        "score long, label boolean",
    )
    assert roc_auc(tied, "score", "label").collect()[0].auc == 0.875

    # anti-predictive score → 0.0; null labels count as negative
    anti = spark.createDataFrame(
        [(5, False), (6, None), (1, True)], "score long, label boolean"
    )
    row = roc_auc(anti, "score", "label").collect()[0]
    assert row.n_neg == 2 and row.auc == 0.0


def test_spearman_rho_known_values(spark):
    from sfcrimedatapipeline_spark.operators.profile import spearman_rho

    # perfect monotone (nonlinear) relation → rho = 1 exactly
    mono = spark.createDataFrame(
        [(1, 1), (2, 8), (3, 27), (4, 64)], "a long, b long"
    )
    row = spearman_rho(mono, "a", "b").collect()[0]
    assert row.n == 4 and abs(row.rho - 1.0) < 1e-12

    # perfect inverse → -1
    inv = spark.createDataFrame([(1, 9), (2, 5), (3, 1)], "a long, b long")
    assert abs(spearman_rho(inv, "a", "b").collect()[0].rho + 1.0) < 1e-12

    # tie-corrected midranks match scipy's definition on a hand case:
    # a = [1,2,2,3], b = [10,20,20,40] → rho = 1 (same tie structure)
    tied = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 20), (3, 40)], "a long, b long"
    )
    assert abs(spearman_rho(tied, "a", "b").collect()[0].rho - 1.0) < 1e-12


def test_runs_test_hand_computed(spark):
    """runs_test vs a hand computation: series 1,5,2,6,3,7,10 by day.
    Lower median of {1,2,3,5,6,7,10} is 5 (rank (7+1) div 2 = 4);
    excluding the tie leaves signs F,F,T,F,T,T in day order → 4 runs,
    n_above = n_below = 3, mu = 1 + 2·9/6 = 4, z = 0."""
    import math

    from sfcrimedatapipeline_spark.operators.profile import runs_test

    rows = list(enumerate([1, 5, 2, 6, 3, 7, 10], start=1))
    df = spark.createDataFrame(rows, "d long, v long")
    r = runs_test(df, "v", "d").collect()[0]
    assert (r.n_above, r.n_below, r.n_runs) == (3, 3, 4)
    assert r.mu == 4.0
    assert abs(r.sigma - math.sqrt(18 * 12 / (36 * 5))) < 1e-15
    assert r.z == 0.0


def test_runs_test_degenerate_series_yields_nulls(spark):
    """All-equal values are all ties at the median → zero retained
    signs; the statistics must be NULL, not a division error. One-side
    series (strictly increasing steps above the median only after
    exclusion) must also guard sigma."""
    from sfcrimedatapipeline_spark.operators.profile import runs_test

    flat = spark.createDataFrame(
        [(i, 7) for i in range(1, 6)], "d long, v long"
    )
    r = runs_test(flat, "v", "d").collect()[0]
    assert (r.n_above, r.n_below, r.n_runs) == (0, 0, 0)
    assert r.mu is None and r.sigma is None and r.z is None

    # two values, one above one below → var_num = 4*(4-2) = 8 > 0 but
    # n-1 = 1: formula still defined; sanity that no NULL sneaks in
    two = spark.createDataFrame([(1, 1), (2, 9)], "d long, v long")
    r2 = runs_test(two, "v", "d").collect()[0]
    assert (r2.n_above, r2.n_below, r2.n_runs) == (1, 0, 1)
    # one side empty → sigma/z NULL by the n1>0 AND n2>0 guard
    assert r2.sigma is None and r2.z is None


def test_bootstrap_mean_ci_deterministic_and_sane(spark):
    """bootstrap_mean_ci: resamples are hash-deterministic (same
    output at any partitioning), the observed mean is the exact
    sum/n, the CI brackets are order statistics that bracket the
    resample distribution's bulk, and se > 0 on a varying series."""
    from sfcrimedatapipeline_spark.operators.profile import (
        BOOT_B,
        bootstrap_mean_ci,
    )

    rows = [(i, 100 + 7 * (i % 13)) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "d long, v long")
    r = bootstrap_mean_ci(df, "v", "d").collect()[0]
    assert r.n_days == 40 and r.b_resamples == BOOT_B
    assert r.mean_obs == sum(v for _, v in rows) / 40.0
    assert r.ci_lo <= r.ci_hi
    # the CI must contain the observed mean for this tame series
    assert r.ci_lo <= r.mean_obs <= r.ci_hi
    assert r.se is not None and r.se > 0.0

    again = bootstrap_mean_ci(df.repartition(7), "v", "d").collect()[0]
    assert again == r  # bit-identical under repartition

    # constant series: every resample mean identical -> zero-width CI,
    # NULL se (variance guard)
    flat = spark.createDataFrame([(i, 5) for i in range(1, 21)], "d long, v long")
    fr = bootstrap_mean_ci(flat, "v", "d").collect()[0]
    assert fr.ci_lo == fr.ci_hi == fr.mean_obs == 5.0
    assert fr.se is None
