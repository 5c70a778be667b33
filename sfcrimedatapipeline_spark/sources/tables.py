"""Parquet table IO — the engine's table sink and the test-data source.

The reference's sink is ``CREATE TABLE IF NOT EXISTS`` + ``TRUNCATE`` +
insert, i.e. an idempotent full refresh per table
(/root/reference/dags/ELT.py:82,147,171,...). The Spark-native
equivalent is an atomic ``mode("overwrite")`` parquet write; columnar at
rest is an upgrade, not a semantic change (SURVEY §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Driver test tables (TESTDATA.md), one parquet file each.
TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table, e.g. ``read_table(spark, '/root/testdata/sf0.01', 'lineitem')``.

    Handles parquet files with TIMESTAMP(NANOS) columns (which Spark's
    vectorized reader rejects) by reading them as longs
    (``nanosAsLong``) and converting to microsecond timestamps — the
    same truncation DuckDB applies when materializing TIMESTAMP_NS.

    Tz-naive parquet timestamps (which Spark 4 reads as TIMESTAMP_NTZ)
    are normalized to TIMESTAMP: under the engine's fixed UTC session
    timezone the wall-clock → instant mapping is the identity, and it
    matches how the DuckDB oracle reads the same column (naive = UTC).
    Keeping one timestamp type engine-wide lets every downstream
    operator use instant functions (``unix_micros``, windowing,
    watermarks) unconditionally.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    nanos_cols = _nanos_columns(path)
    if nanos_cols:
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        for c in nanos_cols:
            # integer division — (col / 1000).cast("long") would round
            # through a double (ns epochs exceed 2^53) and drift by 1 µs
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    else:
        df = spark.read.parquet(path)
    ntz_cols = [
        f.name for f in df.schema.fields if f.dataType.typeName() == "timestamp_ntz"
    ]
    for c in ntz_cols:
        df = df.withColumn(c, df[c].cast("timestamp"))
    return df


_NANOS_CACHE: dict[str, tuple[str, ...]] = {}


def _nanos_columns(path: str) -> tuple[str, ...]:
    """Columns stored as TIMESTAMP(NANOS) (one cheap footer read,
    memoized). ``path`` may be a single parquet file or a Spark-written
    DIRECTORY of part files (one footer is representative — Spark
    writes a uniform schema)."""
    if path not in _NANOS_CACHE:
        import glob

        import pyarrow.parquet as pq

        probe = path
        if os.path.isdir(path):
            parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not parts:
                _NANOS_CACHE[path] = ()
                return _NANOS_CACHE[path]
            probe = parts[0]
        _NANOS_CACHE[path] = tuple(
            f.name for f in pq.read_schema(probe) if str(f.type) == "timestamp[ns]"
        )
    return _NANOS_CACHE[path]


def register_views(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> None:
    """Register each test table as a temp view for the spark.sql surface."""
    for name in tables:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Full-refresh table sink (S4). ``partition_by`` enables partition
    pruning downstream — e.g. the fact table by incident year/month at
    100 TB scale."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
