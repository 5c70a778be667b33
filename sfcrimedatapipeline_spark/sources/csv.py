"""CSV ingest — the engine's equivalent of the reference's COPY loads.

Reference semantics being reproduced (SURVEY §2.1 S2/S3):
- pipe-delimited staging CSV with a header row and ``NULL ''``
  (/root/reference/dags/ELT.py:92-98) → ``sep='|', header=True,
  nullValue=''``;
- comma-delimited dim seed CSVs (/root/reference/dags/ELT.py:151-157,
  175-181).

Schema is always explicit (never inferred); the timestamp format of the
SFPD feed is pinned so mis-parses fail loudly instead of silently
producing NULLs (``mode='FAILFAST'`` for the staging feed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from sfcrimedatapipeline_spark.schemas import STAGING_SCHEMA

#: The SFPD export's datetime format, e.g. ``2023/01/31 09:15:00 AM``
#: (reference column DDL at dags/ELT.py:49; format observed on the feed).
SFPD_TIMESTAMP_FORMAT = "yyyy/MM/dd hh:mm:ss a"


def read_staging_csv(
    spark: SparkSession,
    path: str,
    schema: StructType = STAGING_SCHEMA,
    timestamp_format: str | None = SFPD_TIMESTAMP_FORMAT,
    failfast: bool = True,
) -> DataFrame:
    """Load the pipe-delimited incident feed (COPY at dags/ELT.py:92-98)."""
    reader = (
        spark.read.schema(schema)
        .option("sep", "|")
        .option("header", True)
        .option("nullValue", "")
        .option("mode", "FAILFAST" if failfast else "PERMISSIVE")
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_dim_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Load a comma-delimited dimension seed CSV (dags/ELT.py:151-157,175-181)."""
    return (
        spark.read.schema(schema)
        .option("sep", ",")
        .option("header", True)
        .option("nullValue", "")
        .csv(path)
    )


def read_csv_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType,
    corrupt_col: str = "_corrupt_record",
    **options,
) -> DataFrame:
    """PERMISSIVE CSV read that QUARANTINES malformed lines instead of
    failing the load — the CSV twin of
    :func:`sources.jsonl.read_jsonl_permissive` (same contract: valid
    rows parse into the declared schema, malformed lines land whole in
    ``corrupt_col`` with data columns NULL, clean+quarantined == total).
    Use for third-party CSV feeds where FAILFAST (the reference's COPY
    fidelity mode, :func:`read_staging_csv`) would let one bad vendor
    line kill a whole load.
    """
    from pyspark.sql.types import StringType

    full = StructType(schema.fields[:]).add(corrupt_col, StringType())
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", options.pop("header", "false"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)
