"""Skew-mitigation join strategies.

AQE's skew-join handles sort-merge skew at runtime, but a broadcast-
ineligible dimension joined on a pathologically hot key still lands the
hot key's rows in one task under plain hash partitioning. Salting is
the classic static remedy: replicate the SMALL side once per salt,
scatter the big side's rows across salts, join on (key, salt). The
result set is IDENTICAL to the plain join — which is exactly what makes
it oracle-checkable: the DuckDB twin is the UNSALTED join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    left_unique_col: str | None = None,
) -> DataFrame:
    """LEFT equi-join with the big (left) side's hot keys scattered
    across ``salt`` sub-partitions.

    The right side replicates ×``salt`` (explode over the salt range —
    acceptable because salting is for SMALL-but-not-broadcastable
    dimensions); each left row gets ONE deterministic salt from
    ``xxhash64`` of ``left_unique_col`` (any distinct-ish column — the
    join key itself would defeat the scatter, since every row of the
    hot key would hash to the same salt). NULL join keys never match,
    with or without salting — same as plain SQL ``=``.
    """
    if left_unique_col is None:
        raise ValueError("left_unique_col is required to scatter the hot keys")
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(left_unique_col)), F.lit(salt)).cast("int")
    )
    joined = l.join(r, [*on, "__salt"], "left")
    return joined.drop("__salt")


def write_bucketed(df: DataFrame, name: str, path: str, key: str, buckets: int = 8) -> None:
    """Materialize ``df`` as a bucketed+sorted catalog table at ``path``.

    Bucketing pre-shuffles the data ONCE at write time: every later
    equi-join or aggregation on ``key`` between tables bucketed the
    same way runs with NO exchange and NO sort — the co-located-join
    strategy for repeatedly-joined fact/dim tables at scale. Uses the
    session catalog's native (non-Hive) bucketed V1 tables.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def bucketed_colocated_join(
    left_name: str, right_name: str, left_key: str, right_key: str
):
    """Join two same-bucketed catalog tables on their bucket keys with a
    sort-merge hint (a small side would otherwise broadcast, hiding the
    point): the plan must contain NO Exchange — asserted by
    tests/test_plan_quality.py."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    l, r = spark.table(left_name), spark.table(right_name)
    return l.hint("merge").join(r, F.col(left_key) == F.col(right_key))


def join_strategy_advisor(
    left: DataFrame,
    right: DataFrame,
    l_key: str,
    r_key: str,
    broadcast_rows: int = 1_000_000,
    skew_share: float = 0.2,
) -> DataFrame:
    """Pre-flight join diagnosis: one row of exact key statistics for
    both sides plus the physical strategy a planner should pick —
    ``broadcast_left``/``broadcast_right`` when a side fits the
    broadcast budget (row-count proxy; plug in byte stats where
    available), ``salted_shuffle`` when the hottest key carries more
    than ``skew_share`` of the bigger side (one reducer would own that
    key's whole partition — operators/joins.py:salted_left_join is the
    fix), else ``shuffle``. The decision CASE is deterministic on
    exact aggregates, so the whole report is hash-gateable.

    Cost: one map-side-combined aggregate per side (count + distinct +
    max single-key count via a two-level groupBy) — the same stats an
    ANALYZE would persist; run it once and store the row.
    """

    def stats(df: DataFrame, key: str, tag: str) -> DataFrame:
        per_key = df.groupBy(F.col(key).alias("__k")).agg(
            F.count("*").alias("__c")
        )
        return per_key.agg(
            F.sum("__c").cast("long").alias(f"{tag}_rows"),
            F.count("*").cast("long").alias(f"{tag}_keys"),
            F.max("__c").cast("long").alias(f"{tag}_max_key_rows"),
        )
    ls = stats(left, l_key, "left")
    rs = stats(right, r_key, "right")
    rep = ls.crossJoin(rs)
    bigger_rows = F.greatest(F.col("left_rows"), F.col("right_rows"))
    hot_share = (
        F.when(
            F.col("left_rows") >= F.col("right_rows"),
            F.col("left_max_key_rows").cast("double")
            / F.col("left_rows").cast("double"),
        ).otherwise(
            F.col("right_max_key_rows").cast("double")
            / F.col("right_rows").cast("double")
        )
    )
    strategy = (
        F.when(F.col("right_rows") <= broadcast_rows, F.lit("broadcast_right"))
        .when(F.col("left_rows") <= broadcast_rows, F.lit("broadcast_left"))
        .when(hot_share > skew_share, F.lit("salted_shuffle"))
        .otherwise(F.lit("shuffle"))
    )
    return rep.select(
        "left_rows",
        "left_keys",
        "left_max_key_rows",
        "right_rows",
        "right_keys",
        "right_max_key_rows",
        hot_share.alias("hot_key_share"),
        bigger_rows.alias("bigger_side_rows"),
        strategy.alias("strategy"),
    )
