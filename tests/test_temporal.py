"""Edge-case semantics of the temporal join operators: tie handling,
unmatched rows, and bin boundaries — the cases the sf-scale oracle gate
exercises only by accident."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.operators.temporal import US, asof_join, binned_range_join


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_matches_equal_ts_and_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(5), "c")],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(15), 200), (2, _ts(9), 300)],
        "k long, ts timestamp, v int",
    )
    out = {
        r["tag"]: r["v"]
        for r in asof_join(left, right, on="k", ts="ts", value_cols=["v"]).collect()
    }
    # equal ts matches (>= contract); latest prior wins; no future match
    assert out == {"a": 100, "b": 200, "c": None}


def test_asof_unmatched_left_rows_survive_with_nulls(spark):
    left = spark.createDataFrame([(1, _ts(1)), (3, _ts(9))], "k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(5), 7)], "k long, ts timestamp, v int")
    rows = asof_join(left, right, on="k", ts="ts", value_cols=["v"]).collect()
    assert len(rows) == 2  # LEFT semantics: key 3 and the too-early row stay
    assert all(r["v"] is None for r in rows)


def test_asof_duplicate_ts_resolves_by_tiebreak(spark):
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10), 5), (1, _ts(10), 9), (1, _ts(10), 2)],
        "k long, ts timestamp, v int",
    )
    rows = asof_join(left, right, on="k", ts="ts", value_cols=["v"], tiebreak="v").collect()
    assert [r["v"] for r in rows] == [9]  # largest tiebreak wins


def test_binned_range_join_boundaries_and_multi_bin_span(spark):
    # bin width 10 s; interval [15 s, 35 s) spans bins 1..3
    points = spark.createDataFrame(
        [(i, s * US) for i, s in enumerate([14, 15, 20, 34, 35])],
        "pid long, ts_us long",
    )
    intervals = spark.createDataFrame(
        [(100, 15 * US, 35 * US)], "wid long, lo_us long, hi_us long"
    )
    out = binned_range_join(
        points, intervals, ts="ts_us", lo="lo_us", hi="hi_us", bin_width_s=10
    )
    got = sorted(r["pid"] for r in out.collect())
    # lo inclusive (15), hi exclusive (35), 14 outside; each pair once
    assert got == [1, 2, 3]


def test_binned_range_join_no_duplicate_pairs_on_overlapping_intervals(spark):
    points = spark.createDataFrame([(1, 25 * US)], "pid long, ts_us long")
    intervals = spark.createDataFrame(
        [(10, 0, 60 * US), (20, 20 * US, 30 * US)], "wid long, lo_us long, hi_us long"
    )
    out = binned_range_join(
        points, intervals, ts="ts_us", lo="lo_us", hi="hi_us", bin_width_s=10
    )
    assert sorted(r["wid"] for r in out.collect()) == [10, 20]
    assert out.count() == 2  # one row per qualifying (point, interval) pair


def test_asof_join_single_exchange_plan(spark):
    # the scale contract: ONE hashpartitioning shuffle on the key feeds
    # the merge window — no nested-loop join anywhere
    left = spark.createDataFrame([(1, _ts(10))], "k long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(5), 7)], "k long, ts timestamp, v int")
    df = asof_join(left, right, on="k", ts="ts", value_cols=["v"])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    assert tree.count("Exchange") == 1


def test_resample_locf_fills_gaps(spark):
    import datetime as dt

    from sfcrimedatapipeline_spark.operators.temporal import resample_locf

    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)
    rows = [
        (1, t0, 10.00),                                  # hour 0
        (1, t0 + dt.timedelta(minutes=5), 20.00),        # hour 0, later → wins
        (1, t0 + dt.timedelta(hours=3), 30.00),          # hour 3
        (2, t0, 99.00),                                  # single-event user
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {
        (r.user_id, r.bucket_ts.hour): (r.obs_cents, r.filled_cents)
        for r in resample_locf(df, bucket_seconds=3600).collect()
    }
    # user 1: 4 spine buckets (hours 0..3); gaps 1-2 carry hour 0's last obs
    assert out[(1, 0)] == (2000, 2000)
    assert out[(1, 1)] == (None, 2000)
    assert out[(1, 2)] == (None, 2000)
    assert out[(1, 3)] == (3000, 3000)
    # user 2: exactly one bucket, no gaps
    assert out[(2, 0)] == (9900, 9900)
    assert len(out) == 5


def test_time_weighted_avg_manual(spark):
    import datetime as dt

    from sfcrimedatapipeline_spark.operators.temporal import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # 10.00 held 10 s, then 30.00 held 30 s, last event open-ended
        (1, t0, 10.00),
        (1, t0 + dt.timedelta(seconds=10), 30.00),
        (1, t0 + dt.timedelta(seconds=40), 50.00),
        (2, t0, 77.00),  # single event → no segment → no row
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r.user_id: r for r in time_weighted_avg(df).collect()}
    assert set(got) == {1}
    r = got[1]
    assert r.n_segments == 2
    assert r.total_us == 40_000_000
    # (1000*10 + 3000*30) / 40 = 2500 cents
    assert r.twa_cents == 2500.0
