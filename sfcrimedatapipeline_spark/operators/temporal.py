"""Temporal join operators Spark lacks as built-ins: as-of join and
range (interval) join, both expressed as shuffle-bounded compositions
of DataFrame ops — never an inequality join, which Spark can only plan
as BroadcastNestedLoop (quadratic at scale).

Reference provenance: the reference pipeline (dags/ELT.py) has no
temporal joins — these are north-star extension operators for the
training-data use case (aligning events to the latest snapshot /
counting activity inside promo windows).

Scale notes
-----------
``asof_join`` uses the union-merge formulation: tag both inputs, union
them, and take ``last(right_value, ignorenulls=True)`` over a window
partitioned by the join key and ordered by event time. Cost is ONE
shuffle of (left + right) on the key — the same shuffle a plain
equi-join would pay — and the merge scans each key's timeline once.
This is the standard large-scale formulation (Flink's temporal join and
kdb's aj are the same shape).

``binned_range_join`` buckets time into fixed-width bins: each interval
explodes to the bins it spans, each point belongs to exactly ONE bin,
and the pair space collapses to an equi-join on bin followed by a
residual ``lo <= ts < hi`` filter. Output pairs are produced exactly
once (the point's single bin), so no dedup pass is needed. Shuffle is
proportional to rows × (interval span / bin width) — pick the bin width
near the median interval span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: microseconds per second, for epoch arithmetic
US = 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward as-of join: for every left row, attach ``value_cols``
    from the latest right row with ``right.ts <= left.ts`` and the same
    ``on`` key (DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``
    semantics — a ts-equal right row DOES match). Unmatched left rows
    keep NULL value columns, like a LEFT join.

    Both inputs must share the ``on`` and ``ts`` column names;
    ``value_cols`` exist only on the right. ``tiebreak`` (a right
    column) makes the winner deterministic when several right rows
    carry the same (key, ts) — the LARGEST tiebreak wins ("last write
    wins").
    """
    null = F.lit(None)
    l_tagged = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"_r_{c}", null.cast(right.schema[c].dataType))

    r_tagged = right.select(
        on,
        ts,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    # align schemas: left columns the right side lacks become nulls
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, null.cast(l_tagged.schema[c].dataType))
    r_tagged = r_tagged.select(*l_tagged.columns)

    # Sort: time, then right-before-left at equal ts (so ts-equal right
    # rows ARE visible to the left row — the >= contract), then the
    # tiebreak so duplicate (key, ts) right rows resolve greatest-last.
    order = [F.col(ts).asc(), F.col("_side").asc()]
    if tiebreak is not None:
        order.append(F.col(f"_r_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_tagged.unionByName(r_tagged)
    for c in value_cols:
        merged = merged.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    out = merged.filter(F.col("_side") == 1).drop("_side")
    for c in value_cols:
        out = out.withColumnRenamed(f"_r_{c}", c)
    return out


def binned_range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str,
    lo: str,
    hi: str,
    bin_width_s: int,
) -> DataFrame:
    """Join every point row to every interval row with
    ``lo <= ts < hi`` (half-open), as an equi-join on time bins.

    ``ts``/``lo``/``hi`` are epoch-MICROSECOND long columns (use
    ``F.unix_micros`` upstream). Intervals explode to each bin they
    overlap; points carry their single bin; the residual filter removes
    same-bin non-overlaps. Each qualifying pair appears exactly once.

    Bin ids use integer ``div`` (never float division — an epoch-micros
    quotient near a bin boundary could round across it in a double).
    """
    binus = bin_width_s * US
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            # every bin with some instant in [lo, hi)
            F.sequence(F.expr(f"{lo} div {binus}"), F.expr(f"({hi} - 1) div {binus}"))
        ),
    )
    pt = points.withColumn("_bin", F.expr(f"{ts} div {binus}"))
    return (
        pt.join(iv, on="_bin", how="inner")
        .filter((F.col(ts) >= F.col(lo)) & (F.col(ts) < F.col(hi)))
        .drop("_bin")
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: one output row with, per step k, the
    number of users whose events contain the step sequence IN ORDER
    (step k strictly after the user's earliest completion of step k-1 —
    the standard min-time-chain semantics, immune to repeated events).

    Per step: filter to the step type, join the previous frontier on
    the user key, keep events strictly later, take the per-user min.
    Each stage is one filtered scan + one join + one map-side-combined
    min — the frontier frames are user-cardinality, so at scale each
    join broadcasts or hash-joins a shrinking user set against a
    filtered event slice, never event×event.
    """
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    counts = [frontier.agg(F.count("*").alias("n")).select("n")]
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(frontier.withColumnRenamed("__t", "__prev"), user_col)
            .filter(F.col(ts_col) > F.col("__prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        frontier = nxt
        counts.append(frontier.agg(F.count("*").alias("n")).select("n"))
    out = counts[0].select(F.col("n").cast("long").alias("n_step1"))
    for i, c in enumerate(counts[1:], start=2):
        out = out.crossJoin(
            c.select(F.col("n").cast("long").alias(f"n_step{i}"))
        )
    return out


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    FIRST event; one row per (cohort_week, week_offset) counting the
    cohort's users active in that later week. The standard growth
    triangle.

    Two aggregations and one join, all user/week-cardinality after the
    first map-side-combined pass over events; distinct activity weeks
    per user bound the join input to (users × active weeks)."""
    weeks = events.select(
        F.col(user_col),
        F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
    ).distinct()
    first = weeks.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    joined = weeks.join(first, user_col).select(
        user_col,
        "cohort_week",
        (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("week_offset"),
    )
    if max_weeks is not None:
        joined = joined.filter(F.col("week_offset") <= max_weeks)
    return (
        joined.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def resample_locf(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Regularize an irregular event series onto a fixed time SPINE with
    last-observation-carried-forward fill — the standard prep for
    feeding event data to models that expect one row per (key, period)
    (kdb's ``fills``, Pandas ``resample().ffill()``, TimescaleDB's
    ``time_bucket_gapfill``).

    Per key: a complete bucket spine spans that key's own [min, max]
    event time; each bucket carries its LAST observation (total order:
    exact epoch micros, tie-broken by value so the pick is
    partitioning-independent), and empty buckets inherit the latest
    earlier observation via last-IGNORE-NULLS. The first bucket always
    has an observation by construction (the key's min event lands in
    it), so ``filled_cents`` is never NULL.

    All time arithmetic is EXACT INTEGER MICROSECONDS (unix_micros /
    epoch_us in the oracle) — never double epoch, whose truncation
    differs across engines.

    Scale shape: one groupBy(key) for the span, one shuffle on
    (key, bucket) for last-in-bucket, one window shuffle on key for
    the fill. Spine rows per key = wall-clock span / bucket — bounded
    by horizon, not event count, so a hot key with 10^9 events yields
    the same spine as a cold one.
    """
    bucket_us = bucket_seconds * US
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    micros = F.unix_micros(F.col(ts_col))
    bucket = F.floor(micros / bucket_us).cast("long")
    obs = (
        df.select(
            F.col(key_col),
            bucket.alias("__b"),
            F.struct(micros.alias("o"), cents.alias("v")).alias("ob"),
        )
        .groupBy(key_col, "__b")
        .agg(F.max("ob")["v"].alias("obs_cents"))
    )
    spine = (
        df.groupBy(key_col)
        .agg(
            F.floor(F.min(micros) / bucket_us).cast("long").alias("b0"),
            F.floor(F.max(micros) / bucket_us).cast("long").alias("b1"),
        )
        .select(key_col, F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("__b"))
    )
    joined = spine.join(obs, [key_col, "__b"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        F.timestamp_micros(F.col("__b") * bucket_us).alias("bucket_ts"),
        "obs_cents",
        F.last("obs_cents", ignorenulls=True).over(w).alias("filled_cents"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key TIME-WEIGHTED average: each observation holds until the
    next one, so its weight is the time until the next event — the
    correct average for sampled-on-change series (sensor readings,
    account balances), where the plain mean over-weights chatty
    periods.

    Integer discipline: weights are exact epoch-MICROSECOND deltas,
    values exact cents; the weighted sum accumulates in DECIMAL(38,0)
    (cents × micros ≈ 4e15 per segment — a BIGINT sum would overflow
    around 10^3 busy segments) and the total weight in BIGINT.
    The final division is the only double op, so the result is
    bit-stable under any partitioning. Keys with a single event (no
    held segment) have no row.

    One window shuffle on key; the groupBy(key) after it reuses the
    same partitioning (no second exchange).
    """
    micros = F.unix_micros(F.col(ts_col))
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy(key_col).orderBy(micros.asc(), cents.asc())
    seg = df.select(
        F.col(key_col),
        cents.alias("cents"),
        (F.lead(micros).over(w) - micros).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return seg.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_segments"),
        F.sum("dt_us").cast("long").alias("total_us"),
        (
            F.sum((F.col("cents") * F.col("dt_us")).cast("decimal(38,0)")).cast("double")
            / F.sum("dt_us").cast("double")
        ).alias("twa_cents"),
    )
