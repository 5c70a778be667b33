"""JSON-lines source/sink — the interchange format of most LLM corpus
tooling. Explicit schema on read (inference is banned engine-wide,
SURVEY §1.2, and a schema-inference pass would double-scan 100 TB).

Scale notes: one JSONL file per task both ways (no driver collect);
doubles survive the round trip bit-exactly because Spark writes the
shortest round-trip decimal repr. Line-splittable, so a directory of
JSONL parallelizes like any text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a frame as a directory of JSON-lines part files."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Read JSON-lines with an explicit schema. ``FAILFAST`` surfaces
    corrupt lines as errors instead of silent nulls (matching the CSV
    loader's contract, sources/csv.py)."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def read_jsonl_permissive(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """PERMISSIVE JSONL read that QUARANTINES bad lines instead of
    failing the job — the ingest mode for web-scale corpora where some
    malformed fraction is a certainty and one bad shard must not kill a
    100 TB load. Valid rows parse into the declared schema; corrupt
    lines land whole in ``corrupt_col`` with every data column NULL, so
    the caller can split the frame into clean/quarantine sinks with one
    ``isNull`` filter and account for every input line.

    The corrupt column must be part of the declared schema (Spark drops
    it otherwise); this helper appends it. Spark requires caching or
    persistence of the parsed frame before filtering on the corrupt
    column alone — callers filtering should select data columns too
    (both helpers in tests do).
    """
    from pyspark.sql.types import StringType

    if isinstance(schema, str):
        full = f"{schema}, {corrupt_col} string"
    else:
        full = StructType(schema.fields[:]).add(corrupt_col, StringType())
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
