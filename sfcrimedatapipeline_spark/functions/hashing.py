"""Portable hashing — identical results in Spark and DuckDB.

Spark's native ``hash``/``xxhash64`` have no DuckDB equivalent, so every
operator that must be oracle-checkable (minhash, fingerprints, LSH
bucketing) uses an md5-derived 60-bit hash instead: both engines md5
identically, and 15 hex chars always fit a signed 64-bit int. The pair
of builders below — Column expression and SQL-string — are generated
from the same formula so the two sides cannot drift.

At 100 TB this stays JVM-side (md5/conv are Catalyst expressions inside
whole-stage codegen); md5 is ~2-3× slower than xxhash64 but keeps the
correctness gate exact. Swap ``portable_hash64`` for ``F.xxhash64`` in
non-oracle paths if profiling ever shows it hot.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_CHARS = 15  # 60 bits, always non-negative in a signed 64-bit int


def portable_hash64(col: Column, seed: int | Column = 0) -> Column:
    """Spark side: md5(seed || ':' || value) → first 15 hex chars → long."""
    seed_col = F.lit(str(seed)) if isinstance(seed, int) else seed.cast("string")
    digest = F.md5(F.concat(seed_col, F.lit(":"), col.cast("string")))
    return F.conv(F.substring(digest, 1, HEX_CHARS), 16, 10).cast("long")


def sql_hash64(expr: str, seed: str = "0") -> str:
    """DuckDB side of the same formula. ``expr``/``seed`` are SQL fragments."""
    return (
        f"CAST('0x' || substr(md5(CAST({seed} AS VARCHAR) || ':' || "
        f"CAST({expr} AS VARCHAR)), 1, {HEX_CHARS}) AS BIGINT)"
    )
