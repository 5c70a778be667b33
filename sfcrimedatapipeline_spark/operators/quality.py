"""Declarative data-quality EXPECTATIONS — the dbt-test / Delta
CONSTRAINT / Great Expectations shape: a constraint list evaluated
into one violation-count row per rule, so a load can be gated
("fail the publish if anything violates") or monitored (trend the
counts) without hand-writing a query per rule.

Evaluation cost, by constraint class:

- row-level rules (``not_null``, ``range``, ``accepted_values``,
  ``custom`` predicate) fold into ONE conditional-aggregate pass over
  the table — adding a rule adds a counter, not a scan;
- NULL semantics, stated explicitly: a NULL value VIOLATES
  ``accepted_values`` and ``custom`` (unlike SQL CHECK, where NULL
  passes — a data-quality gate that lets NULL through by default
  hides exactly the rows it exists to catch) but does NOT violate
  ``range`` (``not_null`` is its own rule; double-counting NULLs as
  range violations would misattribute the defect);
- ``unique`` is one map-side-combined groupBy on the key (counts keys
  seen more than once, and reports the EXCESS rows);
- ``referential`` is one left-anti join against the parent key set
  (broadcast when the parent is a dim).

Every count is an exact integer, so the whole report is
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Expectation:
    """One declarative rule. ``kind`` ∈ {not_null, unique, range,
    accepted_values, referential, custom}."""

    name: str
    kind: str
    column: str | list[str] | None = None
    lo: float | None = None
    hi: float | None = None
    values: list | None = None
    parent: DataFrame | None = None
    parent_key: str | None = None
    predicate: Column | None = None
    params: dict = field(default_factory=dict)


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations → one row per rule:
    ``(rule, n_violations, passed)``. Row-level rules share a
    single aggregation pass; set-level rules add one bounded job each.

    Raises ``ValueError`` on an empty rule list — an accidental
    no-rules audit reading as "all checks passed" is the dangerous
    outcome; callers wanting a no-op should not call the auditor.
    """
    if not expectations:
        raise ValueError("no expectations given")
    row_aggs = []
    set_frames = []
    for e in expectations:
        if e.kind == "not_null":
            viol = F.col(e.column).isNull()
        elif e.kind == "range":
            c = F.col(e.column)
            cond = F.lit(False)
            if e.lo is not None:
                cond = cond | (c < e.lo)
            if e.hi is not None:
                cond = cond | (c > e.hi)
            # NULLs are not range violations (not_null is its own rule)
            viol = F.coalesce(cond, F.lit(False))
        elif e.kind == "accepted_values":
            viol = F.coalesce(~F.col(e.column).isin(e.values), F.lit(True))
        elif e.kind == "custom":
            viol = F.coalesce(~e.predicate, F.lit(True))
        elif e.kind == "unique":
            # e.column may be one name or a LIST (composite-key
            # uniqueness — dbt's unique_combination_of_columns)
            ucols = e.column if isinstance(e.column, list) else [e.column]
            dup = (
                df.groupBy(*ucols)
                .agg(F.count("*").alias("__n"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1)), F.lit(0)
                    )
                    .cast("long")
                    .alias("n_violations")
                )
                .select(F.lit(e.name).alias("rule"), "n_violations")
            )
            set_frames.append(dup)
            continue
        elif e.kind == "referential":
            orphans = (
                df.select(F.col(e.column).alias("__k"))
                .filter(F.col("__k").isNotNull())
                .join(
                    F.broadcast(
                        e.parent.select(F.col(e.parent_key).alias("__k")).distinct()
                    ),
                    "__k",
                    "left_anti",
                )
                .agg(F.count("*").cast("long").alias("n_violations"))
                .select(F.lit(e.name).alias("rule"), "n_violations")
            )
            set_frames.append(orphans)
            continue
        else:
            raise ValueError(f"unknown expectation kind: {e.kind!r}")
        row_aggs.append(
            F.sum(viol.cast("long")).cast("long").alias(e.name)
        )

    frames = []
    if row_aggs:
        wide = df.agg(*row_aggs)
        stack_args = ", ".join(f"'{a}', `{a}`" for a in [c for c in wide.columns])
        frames.append(
            wide.selectExpr(
                f"stack({len(wide.columns)}, {stack_args}) AS (rule, n_violations)"
            )
        )
    frames.extend(set_frames)
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out.select(
        "rule",
        F.coalesce("n_violations", F.lit(0)).cast("long").alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )


def missing_buckets(
    df: DataFrame,
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """COMPLETENESS monitor: calendar buckets between the table's first
    and last event that contain ZERO rows — the "did yesterday's load
    skip an hour?" check. One aggregate for the span, a generated spine
    (horizon-bounded, like resample_locf's), and one left-anti join
    against the observed bucket set. Exact integer-microsecond epochs.
    """
    us = bucket_seconds * 1_000_000
    micros = F.unix_micros(F.col(ts_col))
    observed = df.select(F.floor(micros / us).cast("long").alias("__b")).distinct()
    spine = (
        df.agg(
            F.floor(F.min(micros) / us).cast("long").alias("b0"),
            F.floor(F.max(micros) / us).cast("long").alias("b1"),
        )
        .select(F.explode(F.sequence(F.col("b0"), F.col("b1"))).alias("__b"))
    )
    return (
        spine.join(observed, "__b", "left_anti")
        .select(F.timestamp_micros(F.col("__b") * us).alias("missing_bucket_ts"))
    )


def write_audit_publish(
    df: DataFrame,
    path: str,
    expectations: list[Expectation],
) -> tuple[bool, DataFrame]:
    """WRITE-AUDIT-PUBLISH: stage the write to a sibling directory,
    audit the STAGED FILES (not the input plan — what's audited is
    byte-for-byte what readers will see), and only then swap it into
    place; on violation the staging dir is removed and the previous
    published data stays untouched. The pattern behind Iceberg's WAP /
    Delta's constraint-gated commits, expressed on plain parquet
    directories (same swap discipline as layout.compact_parquet_dir).

    Swap discipline: the OLD published dir is renamed aside FIRST,
    then staging renamed in, then the old dir deleted — a crash
    between steps leaves the previous data recoverable under
    ``<path>__old_*`` instead of lost (the naive rmtree-then-rename
    has a window where neither version exists). Each step is a
    single-directory ``os.rename``, atomic on POSIX within one
    filesystem; staging lives as a sibling of the target, so the
    same-filesystem requirement holds by construction.

    Returns ``(published, report)`` — the report is the materialized
    per-rule violation table either way, so failed audits are
    diagnosable. Audit cost: one scan of the staged data.
    """
    import os
    import shutil
    import uuid

    spark = df.sparkSession
    # per-run unique staging dir: two concurrent publishers to the same
    # target must never write into each other's staging (the s14
    # catalog-name lesson); the loser of the final rename still simply
    # replaces the winner's directory atomically
    tmp = path.rstrip("/") + f"__staging_{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(tmp)
    staged = spark.read.parquet(tmp)
    report = check_expectations(staged, expectations)
    rows = report.collect()
    ok = all(r.passed for r in rows)
    if ok:
        old = None
        if os.path.exists(path):
            old = path.rstrip("/") + f"__old_{uuid.uuid4().hex[:12]}"
            os.rename(path, old)
        os.rename(tmp, path)
        if old is not None:
            shutil.rmtree(old)
    else:
        shutil.rmtree(tmp)
    return ok, spark.createDataFrame(rows, report.schema)


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str = "pseud",
    prefix_len: int = 12,
) -> DataFrame:
    """Deterministic PSEUDONYMIZATION: replace identifying columns with
    salted-hash tokens that are stable across tables and runs — the
    referential-consistency property that lets pseudonymized tables
    still JOIN on the tokenized key (plain redaction destroys
    joinability; random tokens destroy reproducibility). NULLs stay
    NULL. The salt is the re-identification secret: publish the data,
    keep the salt.

    Pure per-row md5 expressions (the portable-hash discipline), no
    UDF, no shuffle. Not format-preserving and not reversible — this
    is the analytics-release shape, not tokenization-vault encryption.
    """
    out = df
    for c in cols:
        token = F.concat(
            F.lit("p_"),
            F.substring(
                F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(c).cast("string"))),
                1,
                prefix_len,
            ),
        )
        out = out.withColumn(c, F.when(F.col(c).isNotNull(), token))
    return out


def _dgeom(key: Column) -> Column:
    """Geometric(1/2) variate in [0, 31] from an md5-derived 32-bit
    uniform: P(G=j) = 2^-(j+1), realized as the leading-zero count
    32 − length(bin(u32)). Integer-and-string ops only — both engines
    render bin() without padding, so the draw is bit-identical
    cross-engine and partition-independent (the same reason every
    sampler here is an md5-coin, never rand(seed))."""
    u32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return (F.lit(32) - F.length(F.bin(u32))).cast("long")


def dp_noise(key: Column) -> Column:
    """DISCRETE LAPLACE (two-sided geometric) noise with α = 1/2:
    the difference of two independent Geometric(1/2) draws, giving
    P(k) = (1/3)·2^−|k| — the geometric mechanism of Ghosh-
    Roughgarden-Sundararajan, which is ε-differentially-private with
    ε = ln 2 for a sensitivity-1 statistic, and universally
    utility-optimal among ε=ln2 mechanisms for counts.

    Deliberately DISCRETE, not continuous Laplace: sampling continuous
    Laplace needs ln(u), and transcendental libm calls are not
    bit-identical across engines (the same reason drift_tvd is TVD,
    not KL). This construction is md5 → bin() → length — exact
    integers end-to-end, so a DuckDB oracle replays the identical
    noise and the release is hash-gatable."""
    return _dgeom(F.concat(F.lit("a:"), key)) - _dgeom(F.concat(F.lit("b:"), key))


def dp_release_counts(
    df: DataFrame,
    group_cols: list[str],
    value_col: str | None = None,
    clamp_cents: int | None = None,
    seed: str = "dp",
    k_threshold: int | None = None,
) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE aggregate release: per-group noisy count
    (and optionally a noisy clamped sum), each protected by the
    geometric mechanism (:func:`dp_noise`) at ε = ln 2 per released
    statistic with respect to ONE input row.

    - count: sensitivity 1 ⇒ ``released_n = n + noise``.
    - sum: each row's contribution is clamped to [0, clamp_cents]
      integer cents FIRST (contribution bounding — without the clamp a
      sum has unbounded sensitivity and no finite ε), then noised with
      ``clamp_cents · noise`` — the scaled discrete Laplace that gives
      ε = ln 2 at sensitivity clamp_cents.

    The group-key domain is assumed PUBLIC (a fixed taxonomy like
    event types) when ``k_threshold`` is None: groups absent from the
    input are simply absent from the release. For PRIVATE key domains
    (user-generated strings), pass ``k_threshold``: only groups whose
    NOISY count reaches the threshold are released — stability-based
    key selection, the mechanism behind every "publish queries seen
    ≥ k times" release. The selection predicate reads the noisy count,
    never the true one, so it composes as post-processing (no extra ε);
    the threshold sets the probability a rare key slips out
    (P ≈ 2^−(k−n)/3 for a key seen n < k times). True values never
    appear in the output.

    Scale shape: one map-side-combined groupBy; the noise is a per-row
    md5 expression at GROUP grain. Deterministic under ``seed``, so a
    re-run releases identical values instead of leaking fresh draws of
    the same statistic (ε composes across distinct releases, not
    re-runs)."""
    aggs = [F.count("*").cast("long").alias("__n")]
    if value_col is not None:
        if clamp_cents is None:
            raise ValueError("a DP sum requires clamp_cents (contribution bound)")
        cents = F.least(
            F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long"),
            F.lit(clamp_cents),
        )
        aggs.append(F.sum(F.greatest(cents, F.lit(0))).cast("long").alias("__s"))
    g = df.groupBy(*group_cols).agg(*aggs)
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    out = [
        *group_cols,
        (F.col("__n") + dp_noise(F.concat(F.lit(f"{seed}:n:"), key)))
        .cast("long")
        .alias("released_n"),
    ]
    if value_col is not None:
        out.append(
            (
                F.col("__s")
                + F.lit(clamp_cents)
                * dp_noise(F.concat(F.lit(f"{seed}:s:"), key))
            )
            .cast("long")
            .alias("released_sum_cents")
        )
    released = g.select(*out)
    if k_threshold is not None:
        released = released.filter(F.col("released_n") >= k_threshold)
    return released


def repair_nulls_by_fd(
    df: DataFrame,
    det_col: str,
    dep_col: str,
    repaired_flag: str = "was_repaired",
) -> DataFrame:
    """Impute NULLs in ``dep_col`` from a functional dependency
    ``det_col → dep_col`` discovered in the data itself (the repair
    step after ``profile_functional_deps`` flags the FD): for each
    determinant value, the surviving value is the MODE of the non-null
    dependents, largest value on count ties — a total deterministic
    order, so the repair is reproducible across runs and engines.

    Two shuffles on the determinant (one to build the mode map, one
    broadcast-joined back if small — Spark's AQE will broadcast the
    map side when it fits, since it has one row per distinct
    determinant). Rows whose determinant has no non-null dependent
    anywhere stay NULL with ``repaired_flag`` false.
    """
    m = (
        df.filter(F.col(dep_col).isNotNull())
        .groupBy(det_col, dep_col)
        .agg(F.count("*").alias("__c"))
        .groupBy(det_col)
        .agg(
            F.max_by(
                dep_col,
                F.struct(F.col("__c").alias("c"), F.col(dep_col).alias("v")),
            ).alias("__fill")
        )
    )
    out_cols = [
        F.coalesce(F.col(dep_col), F.col("__fill")).alias(c)
        if c == dep_col
        else F.col(c)
        for c in df.columns
    ]
    return (
        df.join(m, det_col, "left")
        .select(
            *out_cols,
            (F.col(dep_col).isNull() & F.col("__fill").isNotNull()).alias(
                repaired_flag
            ),
        )
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
) -> DataFrame:
    """t-closeness audit — the third rung of the anonymity ladder after
    k-anonymity (group size) and l-diversity (distinct sensitive
    values): per quasi-identifier group, the distance between the
    group's sensitive-value distribution and the whole table's. For
    categorical sensitive attributes the ground distance is uniform,
    so EMD reduces to total variation: t = ½·Σ_v |p_g(v) − p(v)|.

    EXACT-RATIONAL: the summand is |c_gv·N − C_v·n_g| in integers
    (cross-multiplied, never a per-value float ratio), one final
    division to double — bit-stable under any partitioning and shared
    verbatim with the oracle. BIGINT headroom: c_gv·N ≤ n·N caps at
    ~3·10⁹ rows; lift the product to DECIMAL(38,0) past that.

    Cost: one (quasi × sensitive)-grained aggregate, one broadcast of
    the value-marginal (sensitive-domain-bounded), one group rollup.
    Values the group LACKS still contribute |0 − C_v·n_g| via the
    marginal side: the complement term Σ_{v∉g} C_v·n_g = (N − Σ_{v∈g}
    C_v)·n_g is added in closed form rather than densifying the join.
    """
    from pyspark.sql import Window

    gv = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").alias("__c_gv")
    )
    marg = df.groupBy(sensitive_col).agg(F.count("*").alias("__c_v"))
    total = df.count()  # driver scalar (an aggregate, not a row collect)
    # group size on the ALREADY-AGGREGATED (quasi x sensitive) frame —
    # the window input is domain-bounded, never the data
    gv2 = gv.withColumn(
        "__n_g", F.sum("__c_gv").over(Window.partitionBy(*quasi_cols))
    )
    per_group = (
        gv2.join(F.broadcast(marg), sensitive_col)
        .groupBy(*quasi_cols)
        .agg(
            F.max("__n_g").cast("long").alias("n_g"),
            F.sum(
                F.abs(
                    F.col("__c_gv") * F.lit(total)
                    - F.col("__c_v") * F.col("__n_g")
                )
            ).alias("__present_num"),
            F.sum("__c_v").cast("long").alias("__cv_present"),
        )
    )
    n_g = F.col("n_g")
    num = F.col("__present_num") + (F.lit(total) - F.col("__cv_present")) * n_g
    return per_group.select(
        *quasi_cols,
        "n_g",
        (
            num.cast("double")
            / (F.lit(2.0) * n_g.cast("double") * F.lit(float(total)))
        ).alias("t_closeness"),
    )
