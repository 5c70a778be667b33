"""Upsert (MERGE) and slowly-changing-dimension operators.

The reference rebuilds every warehouse table from scratch each run
(dags/ELT.py:102-110 — full refresh inside one transaction); these
operators are the incremental-maintenance counterparts a 100 TB
deployment needs, where a full rebuild is not an option.

Scale notes
-----------
``merge_upsert`` is anti-join + union, NOT a full-outer join with
per-column coalesce: the typical delta is orders of magnitude smaller
than the base, so the anti-join broadcasts the delta's keys and the
base table is never shuffled at all — the merge costs one scan of the
base plus a broadcast. (A full-outer join would shuffle the entire
base on the key.)

``scd2_from_changelog`` is one window over the key: valid_to is the
next change's timestamp (half-open intervals), so the whole history
derives from a single shuffle of the changelog — no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    broadcast_updates: bool = True,
) -> DataFrame:
    """MERGE semantics: rows of ``updates`` replace base rows with the
    same key ("WHEN MATCHED THEN UPDATE" — whole-row), unmatched update
    rows are inserted ("WHEN NOT MATCHED THEN INSERT"), all other base
    rows survive unchanged. Both frames must share one schema.

    ``broadcast_updates`` (default) hints the delta's key set for the
    anti-join — correct whenever the delta fits an executor, which is
    the normal incremental-load case.
    """
    delta_keys = updates.select(*keys).distinct()
    if broadcast_updates:
        delta_keys = F.broadcast(delta_keys)
    surviving = base.join(delta_keys, on=keys, how="left_anti")
    return surviving.unionByName(updates)


def scd2_from_changelog(
    changelog: DataFrame,
    key: str,
    change_ts: str,
    tiebreak: str,
) -> DataFrame:
    """Type-2 SCD history from a change log: one output row per change,
    with half-open validity ``[valid_from, valid_to)``, ``valid_to``
    NULL on the current version, a 1-based ``version`` counter, and
    ``is_current``.

    ``tiebreak`` orders simultaneous changes of one key (later tiebreak
    = later version), making the history deterministic.
    """
    w = Window.partitionBy(key).orderBy(F.col(change_ts).asc(), F.col(tiebreak).asc())
    return (
        changelog.withColumn("valid_from", F.col(change_ts))
        .withColumn("valid_to", F.lead(change_ts).over(w))
        .withColumn("version", F.row_number().over(w).cast("int"))
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def incremental_agg_merge(
    state: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_col: str = "value",
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: combine an
    existing per-key aggregate STATE ``(keys, n_rows, sum_value
    [decimal], min_value, max_value)`` with a raw DELTA batch, without
    touching the raw history the state summarizes.

    This is the streaming-materialized-view pattern: count/sum/min/max
    are decomposable aggregates, so ``state ⊕ partial_agg(delta)``
    equals a full recompute EXACTLY — the sum is kept in decimal, which
    is associative-exact, so the merged state is bit-identical to
    ``groupBy`` over the union (the oracle recomputes from scratch to
    prove it).

    Scale shape: the delta shuffles at DELTA size for its partial
    aggregate; the combine is a full-outer join on the key between two
    aggregate-cardinality frames (both far smaller than raw data). A
    full recompute would re-shuffle the entire history instead.
    ``build_agg_state`` produces the state shape from raw rows.
    """
    d = build_agg_state(delta, keys, value_col)
    s, dd = state.alias("s"), d.alias("d")
    cond = [F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys]
    return s.join(dd, cond, "full_outer").select(
        *[F.coalesce(F.col(f"s.{k}"), F.col(f"d.{k}")).alias(k) for k in keys],
        (
            F.coalesce(F.col("s.n_rows"), F.lit(0))
            + F.coalesce(F.col("d.n_rows"), F.lit(0))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("s.sum_value"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("d.sum_value"), F.lit(0).cast("decimal(18,2)"))
        ).cast("decimal(18,2)").alias("sum_value"),
        F.least(
            F.coalesce(F.col("s.min_value"), F.col("d.min_value")),
            F.coalesce(F.col("d.min_value"), F.col("s.min_value")),
        ).alias("min_value"),
        F.greatest(
            F.coalesce(F.col("s.max_value"), F.col("d.max_value")),
            F.coalesce(F.col("d.max_value"), F.col("s.max_value")),
        ).alias("max_value"),
    )


def build_agg_state(
    raw: DataFrame, keys: list[str], value_col: str = "value"
) -> DataFrame:
    """Per-key aggregate state from raw rows — the partial-agg shape
    ``incremental_agg_merge`` combines (decimal sum for exactness)."""
    return raw.groupBy(*keys).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("sum_value"),
        F.min(F.col(value_col).cast("double")).alias("min_value"),
        F.max(F.col(value_col).cast("double")).alias("max_value"),
    )


def apply_cdc(
    base: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    broadcast_changes: bool = True,
) -> DataFrame:
    """Apply a CDC changelog (upserts AND deletes) to a snapshot — the
    Debezium/"APPLY CHANGES INTO" shape :func:`merge_upsert` doesn't
    cover: each change row carries ``op`` ('u' upsert / 'd' delete) and
    a monotonic ``seq``; only each key's LATEST change (by seq, total
    order) decides its fate.

    Semantics: latest op 'd' → key dropped (even if it was also
    upserted earlier in the batch); latest op 'u' → that row replaces
    the base row or inserts; untouched base rows pass through. Any
    op value other than 'u' behaves as a delete (the key leaves the
    base and nothing is re-inserted) — validate the op domain upstream
    if the changelog may carry other codes.

    Scale shape, same contract as merge_upsert: the changelog is the
    small side (broadcast) — the base never shuffles; the base-side
    work is ONE broadcast anti-join. The per-key latest-change window
    runs on the changelog only (delta-sized).
    """
    # seq DESC decides; op then a full-row fingerprint break ties so a
    # changelog carrying two rows with equal (keys, seq) still resolves
    # deterministically instead of by partition order
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(),
        F.col(op_col).asc(),
        F.md5(
            F.concat_ws(
                "\u0001",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\u0000"))
                    for c in changelog.columns
                ],
            )
        ).asc(),
    )
    latest = (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    maybe_b = F.broadcast if broadcast_changes else (lambda d: d)
    survivors = base.join(maybe_b(latest.select(*keys)), keys, "left_anti")
    upserts = latest.filter(F.col(op_col) == "u").drop(op_col, seq_col)
    return survivors.unionByName(upserts)


def partition_fingerprints(
    df: DataFrame,
    part_col,
    part_name: str = "part",
) -> DataFrame:
    """Per-partition content fingerprint: ``(part, n_rows, checksum)``
    where the checksum is an ORDER-INSENSITIVE exact sum of per-row
    60-bit hashes over ALL columns (NULL-tagged, unit-separated — the
    table_diff row-checksum discipline) accumulated in DECIMAL(38,0).
    One map-side-combined aggregate at partition-key cardinality.

    The smart-backfill primitive: fingerprint yesterday's manifest,
    fingerprint today's input, and :func:`stale_partitions` names
    exactly the partitions to recompute — no timestamps to trust, no
    full-table diff to run.
    """
    from sfcrimedatapipeline_spark.functions.hashing import portable_hash64

    data_cols = [c for c in df.columns]
    row_repr = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in data_cols]
    )
    return (
        df.select(part_col.alias(part_name), portable_hash64(row_repr).alias("__h"))
        .groupBy(part_name)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("__h").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("checksum"),
        )
    )


def stale_partitions(
    manifest: DataFrame,
    current: DataFrame,
    part_name: str = "part",
) -> DataFrame:
    """Compare two partition-fingerprint frames → one row per partition
    needing work, tagged ``changed`` / ``new`` / ``vanished``.
    Unchanged partitions (same rows AND checksum) emit nothing — the
    recompute set IS the output. A full-outer join at partition-key
    cardinality; the raw tables are never re-read here.
    """
    m = manifest.select(
        part_name,
        F.col("n_rows").alias("__mn"),
        F.col("checksum").alias("__mc"),
    )
    c = current.select(
        part_name,
        F.col("n_rows").alias("__cn"),
        F.col("checksum").alias("__cc"),
    )
    j = m.join(c, part_name, "full_outer")
    status = (
        F.when(F.col("__mn").isNull(), F.lit("new"))
        .when(F.col("__cn").isNull(), F.lit("vanished"))
        .when(
            (F.col("__mn") != F.col("__cn")) | (F.col("__mc") != F.col("__cc")),
            F.lit("changed"),
        )
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            part_name,
            "status",
            F.col("__mn").alias("manifest_rows"),
            F.col("__cn").alias("current_rows"),
        )
    )
