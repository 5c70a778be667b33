"""Edge-case + parity tests for the round-6 analytic extensions:
interval-overlap join (exactly-once pair emission across shared bins),
2-D skyline (band pruning never drops a frontier row), OLS trend
(numpy parity), and the HLL rollup's accuracy contract."""

from __future__ import annotations

import itertools
import random

import numpy as np
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.operators.profile import skyline_2d
from sfcrimedatapipeline_spark.operators.temporal import US, interval_overlap_join


def _brute_overlaps(ls, rs):
    return {
        (li, ri)
        for (li, llo, lhi), (ri, rlo, rhi) in itertools.product(ls, rs)
        if max(llo, rlo) < min(lhi, rhi)
    }


def test_interval_overlap_matches_brute_force_exactly_once(spark):
    rng = random.Random(7)
    # spans from sub-bin to multi-bin so pairs share 0..5 bins
    ls = [
        (i, lo := rng.randrange(0, 100 * US), lo + rng.randrange(1, 40 * US))
        for i in range(60)
    ]
    rs = [
        (i, lo := rng.randrange(0, 100 * US), lo + rng.randrange(1, 40 * US))
        for i in range(60)
    ]
    left = spark.createDataFrame(ls, "lid long, l_lo long, l_hi long")
    right = spark.createDataFrame(rs, "rid long, r_lo long, r_hi long")
    out = interval_overlap_join(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", bin_width_s=10
    ).collect()
    pairs = [(r["lid"], r["rid"]) for r in out]
    # exactly once: no canonical-bin duplicate survives
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _brute_overlaps(ls, rs)


def test_interval_overlap_touching_endpoints_do_not_match(spark):
    left = spark.createDataFrame([(1, 0, 10 * US)], "lid long, l_lo long, l_hi long")
    right = spark.createDataFrame(
        [(1, 10 * US, 20 * US), (2, 9 * US, 10 * US + 1)],
        "rid long, r_lo long, r_hi long",
    )
    out = interval_overlap_join(
        left, right, "l_lo", "l_hi", "r_lo", "r_hi", bin_width_s=60
    ).collect()
    # [0,10) vs [10,20): half-open — no overlap; rid=2 overlaps
    assert [r["rid"] for r in out] == [2]


def _brute_skyline(pts):
    out = []
    for p in pts:
        if not any(
            d[1] <= p[1] and d[2] >= p[2] and (d[1] < p[1] or d[2] > p[2])
            for d in pts
        ):
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force_with_ties_and_bands(spark):
    rng = random.Random(3)
    pts = [(i, rng.randrange(0, 1000), rng.randrange(0, 50)) for i in range(300)]
    pts += [(1000, 5, 49), (1001, 5, 49)]  # exact duplicates: both survive
    df = spark.createDataFrame(pts, "id long, x long, y long")
    for band in (1, 7, 100, 10_000):  # incl. one-band and unit-band extremes
        got = sorted(
            (r["id"], r["x"], r["y"])
            for r in skyline_2d(df, "x", "y", band_width=band).collect()
        )
        assert got == _brute_skyline(pts), f"band={band}"


def test_trend_ols_matches_numpy_polyfit():
    # same moment formulas as the query, checked against the reference
    # implementation on an exactly-representable integer series
    xs = np.arange(0, 40, dtype=np.float64)
    ys = (3_000 * xs + 123_456 + ((xs * 7) % 11) * 100).astype(np.float64)
    n = float(len(xs))
    sx, sx2 = xs.sum(), (xs * xs).sum()
    sy, sy2, sxy = ys.sum(), (ys * ys).sum(), (xs * ys).sum()
    slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
    intercept = (sy - slope * sx) / n
    ref_slope, ref_intercept = np.polyfit(xs, ys, 1)
    assert abs(slope - ref_slope) < 1e-6
    assert abs(intercept - ref_intercept) < 1e-4


def test_hll_rollup_within_5pct_of_exact(spark):
    from sfcrimedatapipeline_spark.plans.analytic_ext import events_hll_rollup

    sf_dir = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r["approx_users"]
        for r in events_hll_rollup(spark, sf_dir).collect()
    }
    from sfcrimedatapipeline_spark.sources.tables import read_table

    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(2, 0.05 * n), (t, approx[t], n)
