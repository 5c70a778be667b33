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
