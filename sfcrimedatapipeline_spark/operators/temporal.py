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
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach ``value_cols`` from the
    LATEST right row with ``right.ts <= left.ts`` (``direction=
    "backward"``, the DuckDB ``ASOF LEFT JOIN`` / pandas ``merge_asof``
    default — a ts-equal right row DOES match) or the EARLIEST right
    row with ``right.ts >= left.ts`` (``direction="forward"`` — the
    "next scheduled event" lookup). Unmatched left rows keep NULL
    value columns, like a LEFT join.

    Forward is the same union-merge dataflow with the time order
    REVERSED (descending running frame) — still ONE shuffle on the
    key, never an inequality join.

    Both inputs must share the ``on`` and ``ts`` column names;
    ``value_cols`` exist only on the right. ``tiebreak`` (a right
    column) makes the winner deterministic when several right rows
    carry the same (key, ts) — the LARGEST tiebreak wins in either
    direction ("last write wins").
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
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

    # Sort: time (reversed for forward), then right-before-left at
    # equal ts (so ts-equal right rows ARE visible to the left row —
    # the inclusive contract), then the tiebreak so duplicate (key, ts)
    # right rows resolve greatest-last in traversal order.
    time_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    order = [time_order, F.col("_side").asc()]
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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_lo: str,
    l_hi: str,
    r_lo: str,
    r_hi: str,
    bin_width_s: int,
) -> DataFrame:
    """Join every pair of intervals that OVERLAP — ``max(lo) <
    min(hi)``, half-open — as an equi-join on time bins, never an
    inequality join (Spark can only plan a pure theta join as
    BroadcastNestedLoop: quadratic at scale).

    All four bound columns are epoch-MICROSECOND longs (use
    ``F.unix_micros`` upstream); left and right column names must be
    disjoint. BOTH sides explode to every bin they touch and equi-join
    on the bin id, so shuffle is rows × (span / bin width) per side —
    pick the bin width near the median interval span. A pair that
    shares k bins would surface k times; exactly one copy survives the
    canonical-bin filter ``bin == greatest(l_lo, r_lo) div bin_us``:
    the overlap's first instant lies inside both intervals, so its bin
    is always among the shared bins — no ``distinct`` (and its extra
    full-width shuffle) needed.

    Bin ids use integer ``div`` (a double quotient near a bin boundary
    can round across it at epoch-micros magnitudes).
    """
    binus = bin_width_s * US
    lv = left.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{l_lo} div {binus}"), F.expr(f"({l_hi} - 1) div {binus}")
            )
        ),
    )
    rv = right.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{r_lo} div {binus}"), F.expr(f"({r_hi} - 1) div {binus}")
            )
        ),
    )
    start = F.greatest(F.col(l_lo), F.col(r_lo))
    end = F.least(F.col(l_hi), F.col(r_hi))
    return (
        lv.join(rv, on="_bin", how="inner")
        .filter(
            (start < end)
            & (F.col("_bin") == F.expr(f"greatest({l_lo}, {r_lo}) div {binus}"))
        )
        .drop("_bin")
    )


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_step_gap_s: int | None = None,
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
        candidates = (
            events.filter(F.col(type_col) == step)
            .join(frontier.withColumnRenamed("__t", "__prev"), user_col)
            .filter(F.col(ts_col) > F.col("__prev"))
        )
        if max_step_gap_s is not None:
            # TIME-BOUNDED funnel: the step must land within the gap of
            # the previous step's completion (exact micros)
            candidates = candidates.filter(
                F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__prev"))
                <= max_step_gap_s * US
            )
        nxt = candidates.groupBy(user_col).agg(F.min(ts_col).alias("__t"))
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
    joined = _spine_obs(df, key_col, ts_col, value_col, bucket_us)
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


def _spine_obs(
    df: DataFrame, key_col: str, ts_col: str, value_col: str, bucket_us: int
) -> DataFrame:
    """Shared resample prefix: per-key complete bucket spine LEFT-joined
    with the last-observation-per-bucket → (key, __b, obs_cents)."""
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
    return spine.join(obs, [key_col, "__b"], "left")


def resample_gap_stats(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """BOUNDED-OUTPUT resample audit (VERDICT r7 #4): per key, the gap
    profile of the hourly spine — ``(key, n_buckets, n_obs, n_filled,
    max_gap_run)`` — instead of the full filled series. This is what a
    100 TB resample job actually EMITS for monitoring (the filled
    series itself feeds the next operator, it doesn't come back to a
    driver): output cardinality = distinct keys, not spine rows, so the
    bench line measures the spine dataflow rather than driver
    serialization of a million-row series.

    ``max_gap_run`` (longest consecutive run of unobserved buckets) via
    the gaps-and-islands trick: a running count of NON-NULL
    observations is constant exactly across each gap run, so grouping
    the null rows by (key, that count) yields one row per run. Same
    partitioned-window + map-side-combinable aggregate shape as the
    LOCF fill itself — one extra shuffle on key, all exact integers.
    """
    bucket_us = bucket_seconds * US
    joined = _spine_obs(df, key_col, ts_col, value_col, bucket_us)
    w = (
        Window.partitionBy(key_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = joined.withColumn("__grp", F.count("obs_cents").over(w))
    per_run = (
        runs.filter(F.col("obs_cents").isNull())
        .groupBy(key_col, "__grp")
        .agg(F.count("*").alias("__len"))
    )
    gap = per_run.groupBy(key_col).agg(
        F.sum("__len").cast("long").alias("__n_filled"),
        F.max("__len").cast("long").alias("__max_gap"),
    )
    base = joined.groupBy(key_col).agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.count("obs_cents").cast("long").alias("n_obs"),
    )
    return base.join(gap, key_col, "left").select(
        key_col,
        "n_buckets",
        "n_obs",
        F.coalesce("__n_filled", F.lit(0)).cast("long").alias("n_filled"),
        F.coalesce("__max_gap", F.lit(0)).cast("long").alias("max_gap_run"),
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
    held segment) have no row. Zero-duration segments (equal
    timestamps) count toward ``n_segments`` but carry zero weight in
    both sums, so they cannot move the average.

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
            # cents is widened to DECIMAL(38,0) BEFORE the multiply —
            # a BIGINT cents·dt_us product overflows int64 (and raises
            # under ANSI) once value·gap exceeds ~2^63 µs-cents; the
            # DuckDB oracle multiplies in DECIMAL already
            F.sum(
                F.col("cents").cast("decimal(38,0)") * F.col("dt_us")
            ).cast("double")
            / F.sum("dt_us").cast("double")
        ).alias("twa_cents"),
    )


def resample_interpolate(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Spine gap-fill with LINEAR INTERPOLATION between the surrounding
    observations — :func:`resample_locf`'s companion for quantities
    that drift rather than hold (temperatures, balances accruing
    interest): a gap bucket gets
    ``v_prev + (v_next - v_prev)·(b - b_prev)/(b_next - b_prev)``.

    Exactness: bucket indices and cent values are exact integers, the
    numerator product is exact, and the single division (then one add)
    is correctly-rounded IEEE — the same every engine. Gaps after the
    last observation fall back to LOCF (no right endpoint); the first
    bucket always has an observation.

    Scale shape: identical to resample_locf plus one extra pair of
    forward-looking window columns — still one (key, bucket) shuffle
    and one key-window shuffle, spine bounded by wall-clock horizon.
    The forward-looking pair is computed as ``last IGNORE NULLS`` over
    a REVERSE-ordered running frame, NOT
    ``first ... OVER (CURRENT ROW AND UNBOUNDED FOLLOWING)``: Spark
    evaluates unbounded-FOLLOWING frames by re-aggregating from each
    row to the partition end — O(n²) per key (measured 14 s of the
    query's 21 s at sf0.1) — while both running frames stream in O(n).
    """
    spine = resample_locf(df, key_col, ts_col, value_col, bucket_seconds)
    bucket_us = bucket_seconds * US
    b = (F.unix_micros(F.col("bucket_ts")) / bucket_us).cast("long")
    back = (
        Window.partitionBy(key_col)
        .orderBy(F.col("bucket_ts").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_rev = (
        Window.partitionBy(key_col)
        .orderBy(F.col("bucket_ts").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_b = F.when(F.col("obs_cents").isNotNull(), b)
    staged = spine.select(
        key_col,
        "bucket_ts",
        "obs_cents",
        "filled_cents",
        b.alias("__b"),
        F.last(obs_b, ignorenulls=True).over(back).alias("__bp"),
        F.last("obs_cents", ignorenulls=True).over(back).alias("__vp"),
        F.last(obs_b, ignorenulls=True).over(fwd_rev).alias("__bn"),
        F.last("obs_cents", ignorenulls=True).over(fwd_rev).alias("__vn"),
    )
    interp = F.col("__vp").cast("double") + (
        ((F.col("__vn") - F.col("__vp")) * (F.col("__b") - F.col("__bp"))).cast("double")
        / (F.col("__bn") - F.col("__bp")).cast("double")
    )
    return staged.select(
        key_col,
        "bucket_ts",
        "obs_cents",
        "filled_cents",
        F.when(F.col("obs_cents").isNotNull(), F.col("obs_cents").cast("double"))
        .when(F.col("__bn").isNotNull(), interp)
        .otherwise(F.col("filled_cents").cast("double"))
        .alias("interp_cents"),
    )


def collapse_bursts(
    df: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    within_seconds: int = 60,
    match_value: bool = True,
    id_col: str = "event_id",
) -> DataFrame:
    """Telemetry BURST dedup: drop an event that repeats the previous
    identical observation (same key + value) within ``within_seconds``
    — the at-least-once-delivery / double-click cleaner run before any
    event analytics. ``match_value=False`` relaxes identity to the key
    alone (a DEBOUNCE: keep at most one event per key per quiet
    period).

    Lag-based chain semantics, stated precisely: each event compares to
    the PREVIOUS OCCURRENCE (kept or not), so a burst ticking every
    30 s under a 60 s threshold collapses to its first event no matter
    how long it lasts. ("Within 60 s of the last KEPT event" is
    sequentially dependent — that variant is the stateful streaming
    shape, :mod:`operators.sessionize`'s territory, not a window.)

    One shuffle on (key, value); exact integer micros, total order
    tie-broken by event id.
    """
    keys = key_cols or ["user_id", "event_type"]
    micros = F.unix_micros(F.col(ts_col))
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    parts = [*keys, cents] if match_value else list(keys)
    w = Window.partitionBy(*parts).orderBy(micros.asc(), F.col(id_col).asc())
    gap = micros - F.lag(micros).over(w)
    return (
        df.withColumn("__gap_us", gap)
        .filter(
            F.col("__gap_us").isNull() | (F.col("__gap_us") > within_seconds * US)
        )
        .drop("__gap_us")
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_rows: int = 10,
    threshold: float = 2.5,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-event anomaly score: z-score of each value against the
    trailing ``window_rows`` observations of its key — the standard
    streaming-telemetry outlier flag.

    Moments are EXACT within each frame (integer cent sums and squared
    sums — the s12_moment_stats discipline applied per window), so
    mean/variance/z are fixed IEEE expressions over exact ints:
    bit-stable under any partitioning. Frames shorter than 2 rows or
    with zero variance yield NULL z (no anomaly call on a constant).

    One shuffle on key; all three window aggregates share one frame
    definition, so Spark computes them in a single Window operator.
    """
    micros = F.unix_micros(F.col(ts_col))
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(micros.asc(), F.col(id_col).asc())
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    n = F.count("*").over(w)
    s = F.sum(cents).over(w)
    ss = F.sum(cents * cents).over(w)
    staged = df.select(
        id_col,
        key_col,
        cents.alias("cents"),
        n.alias("__n"),
        s.alias("__s"),
        ss.alias("__ss"),
    )
    nd = F.col("__n").cast("double")
    mean = F.col("__s").cast("double") / nd
    var = F.col("__ss").cast("double") / nd - mean * mean
    z = (F.col("cents").cast("double") - mean) / F.sqrt(var)
    z = F.when((F.col("__n") >= 2) & (var > 0), z)
    return staged.select(
        id_col,
        key_col,
        "cents",
        F.col("__n").cast("int").alias("n_window"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > threshold, F.lit(False)).alias("is_anomaly"),
    )


def holt_linear_forecast(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 7,
) -> DataFrame:
    """Per-key Holt double-exponential (level + trend) smoothing with an
    h-step-ahead forecast — the capacity-planning op a metrics
    warehouse runs nightly. Returns one row per (key, h) with the
    forecast and the final smoothed level/trend.

    The recurrence is inherently sequential per key, so this is the
    one shape that belongs in ``applyInPandas``: Arrow-batched numpy
    per key, keys distributed across executors, zero shuffles beyond
    the groupBy. Contract: one key's HISTORY fits an executor (true by
    construction when the input is a per-key daily/hourly rollup — a
    century of days is 36.5k rows); the raw event stream must be
    aggregated to the forecast grain upstream.

    Initialization: level = y[0], trend = y[1] - y[0] (0 for
    singleton series). Mathematical invariants the tests pin: a
    constant series forecasts the constant for every h; an exactly
    linear series stays ON the line for any alpha/beta (the update
    fixes level_t = y_t, trend_t = slope exactly), so h-step forecasts
    extrapolate it exactly. VALUE-HASH GATED since round 9b: the
    fixed-order scalar recurrence is replayed bit-for-bit by a
    recursive-CTE oracle (plans/analytic_ext.py:_holt_oracle_sql) —
    the smoothing literals interpolate via repr because Python's
    ``1.0 - 0.3`` and SQL decimal ``1.0 - 0.3`` are different doubles.
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{key_col} string, h int, forecast double, level double, trend double"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[value_col].to_numpy(dtype=np.float64)
        lvl = float(y[0])
        trend = float(y[1] - y[0]) if len(y) > 1 else 0.0
        for t in range(1, len(y)):
            prev = lvl + trend
            new_lvl = alpha * float(y[t]) + (1.0 - alpha) * prev
            trend = beta * (new_lvl - lvl) + (1.0 - beta) * trend
            lvl = new_lvl
        key = pdf[key_col].iloc[0]
        return pd.DataFrame(
            {
                key_col: [key] * horizon,
                "h": np.arange(1, horizon + 1, dtype=np.int32),
                "forecast": [lvl + h * trend for h in range(1, horizon + 1)],
                "level": [lvl] * horizon,
                "trend": [trend] * horizon,
            }
        )

    return df.groupBy(key_col).applyInPandas(fit, schema=out_schema)


def acf_pairwise(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
    bucket_seconds: int = 60,
    max_lag: int = 8,
) -> DataFrame:
    """Sample autocorrelation of a bucketed series at lags 1..max_lag →
    ``(lag_buckets, n_pairs, acf)`` — the standard first look at a
    metric's memory (is load self-similar minute-over-minute? does
    value decay follow the hourly cycle?).

    Estimator: PAIRWISE-COMPLETE Pearson — for lag k, correlate the
    (x_t, x_{t+k}) pairs where BOTH buckets exist. Unlike the textbook
    global-mean estimator this is well-defined on gappy series (no
    imputation policy smuggled in) and needs no corpus-wide mean, so
    there is no 1-row crossJoin: per-lag sums are one equi-join + one
    map-side-combined aggregate. ``value_col=None`` correlates bucket
    COUNTS (pure integers); otherwise the value is floor-cents cast.

    All six sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) stay exact
    integers/decimals until one fixed-order IEEE formula (the s12
    discipline) — bit-stable under any partitioning, shared verbatim
    with the oracle.

    Scale shape: bucketing is ONE map-side-combined aggregate; the lag
    expansion multiplies the BUCKET frame (time-range/bucket cardinality,
    not event cardinality) by max_lag via explode, then one equi-join
    on (bucket+lag) and one aggregate to max_lag rows. At 100 TB the
    bucket frame for a year of minutes is 526 k rows × 8 lags — noise
    next to the event scan that feeds it.
    """
    bucket = F.expr(f"unix_micros({ts_col}) div {bucket_seconds * US}").cast(
        "long"
    )
    if value_col is None:
        series = df.groupBy(bucket.alias("__b")).agg(
            F.count("*").cast("long").alias("__x")
        )
    else:
        cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
        series = df.groupBy(bucket.alias("__b")).agg(
            F.sum(cents).cast("long").alias("__x")
        )
    lags = F.explode(
        F.array(*[F.lit(k) for k in range(1, max_lag + 1)])
    ).alias("lag_buckets")
    left = series.select("__b", "__x", lags)
    right = series.select(
        (F.col("__b")).alias("__b2"), F.col("__x").alias("__y")
    )
    paired = left.join(
        right, (F.col("__b") + F.col("lag_buckets")) == F.col("__b2")
    )
    xd = F.col("__x").cast("decimal(38,0)")
    yd = F.col("__y").cast("decimal(38,0)")
    base = paired.groupBy("lag_buckets").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum("__x").cast("long").alias("__sx"),
        F.sum("__y").cast("long").alias("__sy"),
        F.sum(xd * xd).alias("__sx2"),
        F.sum(yd * yd).alias("__sy2"),
        F.sum(xd * yd).alias("__sxy"),
    )
    n = F.col("n_pairs").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    sx2 = F.col("__sx2").cast("double")
    sy2 = F.col("__sy2").cast("double")
    sxy = F.col("__sxy").cast("double")
    # a constant series (tiny fixtures, dead hours) has zero variance:
    # the correlation is undefined — NULL, never an ANSI divide error
    var_prod = (n * sx2 - sx * sx) * (n * sy2 - sy * sy)
    acf = F.when(
        var_prod > 0, (n * sxy - sx * sy) / F.sqrt(var_prod)
    ).otherwise(F.lit(None).cast("double"))
    return base.select("lag_buckets", "n_pairs", acf.alias("acf")).orderBy(
        "lag_buckets"
    )
