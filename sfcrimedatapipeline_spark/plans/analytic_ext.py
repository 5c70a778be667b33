"""Round-6 analytic extension queries: Pareto skyline, per-group OLS
trend, and mergeable HLL sketch rollup.

No reference counterpart (the reference DAG, /root/reference/dags/
ELT.py, runs seven fixed SQL transforms) — these are the exploration /
monitoring operators a 100 TB warehouse runs daily, each built on the
scale disciplines the repo already uses: integer-exact moment sums with
engine-identical double formulas (plans/tpch.py:s12_moment_stats), the
two-phase band prune (operators/profile.py:skyline_2d), and
map-side-combined mergeable sketches (the rollup pattern HLL sketches
exist for — partial states union associatively, so a week→type rollup
never re-reads the raw rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.sources.tables import read_table

SKYLINE_BAND_CENTS = 10_000  # $100 bands over p_retailprice


def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier over parts: minimize retail price, maximize
    size — the rows no other part beats on both axes
    (operators/profile.py:skyline_2d, two-phase band prune + exact
    finish). Prices ride as exact cents (the s12 idiom); the oracle is
    the brute-force quadratic NOT EXISTS self-join — a different
    algorithm, so the hash gate validates the band pruning itself (a
    wrongly-pruned frontier row would change the row count)."""
    from sfcrimedatapipeline_spark.operators.profile import skyline_2d

    part = read_table(spark, sf_dir, "part")
    cents = F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long")
    pts = part.select("p_partkey", "p_size", cents.alias("price_cents"))
    return skyline_2d(
        pts, x_col="price_cents", y_col="p_size", band_width=SKYLINE_BAND_CENTS
    )


#: epoch-day recentering constant — keeps x·y cross terms small enough
#: that their DOUBLE images are exact at any realistic daily total
TREND_X0 = 20_000


def events_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of daily total value: slope
    (cents/day), intercept, and R² of ``daily_cents ~ epoch_day``,
    from EXACT integer/decimal moment sums (the s12_moment_stats
    discipline: the built-in ``regr_slope`` merges partial double
    states in partition order — low bits nondeterministic on a
    cluster; exact sums + a fixed-order IEEE formula shared verbatim
    with the oracle are bit-stable under any partitioning).

    Two map-side-combined aggregations: events → (type, day) daily
    cents, then (type, day) → per-type moments. x is recentered by a
    constant (TREND_X0) so x·y products stay far inside DECIMAL(38,0).
    """
    ev = read_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    day = F.expr("unix_micros(ts) div 86400000000") - F.lit(TREND_X0)
    daily = ev.groupBy(
        F.col("event_type"), day.alias("x")
    ).agg(F.sum(cents).alias("y"))
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    base = daily.groupBy("event_type").agg(
        F.count("*").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(xd * xd).alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(yd * yd).alias("sy2"),
        F.sum(xd * yd).alias("sxy"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sx2 = F.col("sx2").cast("double")
    sy = F.col("sy").cast("double")
    sy2 = F.col("sy2").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n2 = n * sxy - sx * sy
    varx_n2 = n * sx2 - sx * sx
    vary_n2 = n * sy2 - sy * sy
    slope = cov_n2 / varx_n2
    return base.select(
        "event_type",
        "n_days",
        slope.alias("slope_cents_per_day"),
        ((sy - slope * sx) / n).alias("intercept_cents"),
        ((cov_n2 * cov_n2) / (varx_n2 * vary_n2)).alias("r2"),
    )


def events_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-user rollup — the 100 TB pattern exact
    ``countDistinct`` can't follow: build one DataSketches HLL sketch
    per (event_type, week) (``hll_sketch_agg``, map-side combined,
    fixed bytes per group), then roll weeks up to the type by sketch
    UNION (``hll_union_agg``) — the raw rows are read ONCE; every
    coarser rollup level merges kilobyte sketches. A materialized
    weekly sketch table answers arbitrary date-range distinct counts
    the same way.

    Gated rows-only (the a7_approx_distinct precedent): the estimate is
    implementation-defined — DataSketches HLL here vs any oracle
    engine's own sketch. tests/test_analytic_ext.py pins the estimate
    within 5% of the exact per-type distinct count and the weekly
    sketch count against an exact GROUP BY."""
    ev = read_table(spark, sf_dir, "events")
    week = F.expr("unix_micros(ts) div 604800000000").alias("week_id")
    weekly = ev.groupBy(F.col("event_type"), week).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        weekly.groupBy("event_type")
        .agg(
            F.count("*").alias("n_weeks"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "skyline_parts": skyline_parts,
    "events_trend_ols": events_trend_ols,
    # rows-only: sketch estimates are engine-specific by design
    "events_hll_rollup": events_hll_rollup,
}

ORACLE_SQL = {
    "skyline_parts": f"""
        WITH p AS (
            SELECT p_partkey, p_size,
                   CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                       AS price_cents
            FROM part
        )
        SELECT p_partkey, p_size, price_cents
        FROM p c
        WHERE NOT EXISTS (
            SELECT 1 FROM p d
            WHERE d.price_cents <= c.price_cents
              AND d.p_size >= c.p_size
              AND (d.price_cents < c.price_cents OR d.p_size > c.p_size)
        )
    """,
    "events_trend_ols": f"""
        WITH daily AS (
            SELECT event_type,
                   epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000
                       - {TREND_X0} AS x,
                   sum(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                            AS BIGINT)) AS y
            FROM events
            GROUP BY 1, 2
        ),
        m AS (
            SELECT event_type,
                   count(*) AS n_days,
                   sum(x) AS sx,
                   sum(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
                       AS sx2,
                   sum(y) AS sy,
                   sum(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                       AS sy2,
                   sum(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
                       AS sxy
            FROM daily GROUP BY 1
        )
        SELECT event_type,
               n_days,
               (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   / (CAST(n_days AS DOUBLE) * CAST(sx2 AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   AS slope_cents_per_day,
               (CAST(sy AS DOUBLE)
                    - (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                      / (CAST(n_days AS DOUBLE) * CAST(sx2 AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * CAST(sx AS DOUBLE))
                   / CAST(n_days AS DOUBLE) AS intercept_cents,
               ((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                * (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                   / ((CAST(n_days AS DOUBLE) * CAST(sx2 AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                      * (CAST(n_days AS DOUBLE) * CAST(sy2 AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                   AS r2
        FROM m
    """,
}
