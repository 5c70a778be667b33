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
