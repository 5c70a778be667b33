"""Storage-layout operators: z-order clustering for multi-column data
skipping, and small-file compaction — the table-maintenance half of a
100 TB deployment (the reference rebuilds tiny Postgres tables and
never needs either; at parquet-lake scale both are load-bearing).

``zorder_value`` interleaves the low bits of k non-negative integer
columns (bit j of column c lands at position j*k + c), so sorting by
the z-value gives every output file a small axis-aligned hyper-rectangle
of the key space: parquet min/max footer stats then prune files for
predicates on ANY prefix-free subset of the clustered columns, not just
the leading sort key. The expression is a flat chain of shift/and/or —
linear per row, inside whole-stage codegen (32 terms for 2×16 bits;
well under the codegen method budget that the 384-term LSH unroll blew).

The SQL twin (``zorder_sql``) is generated from the same (column, bits)
constants, keeping the Spark and DuckDB formulas provably identical.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zorder_value(cols: list[str], bits: int = 16) -> Column:
    """Morton/z-value (long) interleaving ``bits`` low bits of each
    named column. Inputs must be non-negative and < 2**bits (hash or
    bucket upstream if not)."""
    k = len(cols)
    terms = [
        F.shiftleft(
            F.shiftright(F.col(c).cast("long"), i).bitwiseAND(F.lit(1)),
            i * k + ci,
        )
        for i in range(bits)
        for ci, c in enumerate(cols)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The identical z-value formula as a DuckDB SQL expression,
    generated from the same constants as :func:`zorder_value`."""
    k = len(cols)
    terms = [
        f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {i * k + ci})"
        for i in range(bits)
        for ci, c in enumerate(cols)
    ]
    return " | ".join(terms)


def zorder_write(
    df: DataFrame, path: str, cols: list[str], n_files: int, bits: int = 16
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the z-value of ``cols`` — each file covers one compact
    z-range, i.e. a small rectangle of the clustered key space, which
    is what makes footer min/max stats selective on every clustered
    column."""
    (
        df.withColumn("_z", zorder_value(cols, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ``ceil(total_bytes /
    target_file_bytes)`` files (the small-files compaction every
    long-running ingest needs — metadata pressure and per-file open
    cost dominate scans once files shrink below ~tens of MB).

    Writes to a sibling temp dir first, then swaps — the read and the
    overwrite never race. Returns the new file count.
    """
    import os
    import shutil

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, math.ceil(total / target_file_bytes))
    tmp = path.rstrip("/") + "__compacting"
    spark.read.parquet(path).repartition(n).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n


def range_layout_write(
    df: DataFrame, path: str, order_cols: list[str], n_files: int
) -> None:
    """Write ``df`` range-partitioned AND sorted by ``order_cols`` —
    the time-series layout: each file covers one disjoint key range, so
    footer min/max stats make any range predicate on the leading column
    skip all but the overlapping files. The 1-D companion to
    ``zorder_write`` (z-order trades a little per-column selectivity to
    cover MULTIPLE columns; for a single dominant scan axis — almost
    always event time — plain range layout is strictly better).
    """
    (
        df.repartitionByRange(n_files, *order_cols)
        .sortWithinPartitions(*order_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def compaction_plan(
    files: DataFrame,
    path_col: str,
    bytes_col: str,
    target_bytes: int,
) -> DataFrame:
    """SMALL-FILE compaction planner — the other half of table
    maintenance next to :func:`compact_parquet_dir`, for when the
    manifest is a TABLE (millions of files at lake scale), not a local
    directory listing: assign every file a compaction bin such that
    bins are contiguous in ``path_col`` order (preserving any
    z-order / range layout the writer established) and each bin's
    bytes land near ``target_bytes``.

    Assignment is the distributed-planner standard: exclusive running
    total of sizes over the path order, ``bin = floor(excl_cum /
    target)``. A bin can overshoot by at most one file (the straddling
    file joins the bin it starts in) — the price of a plan computable
    in one pass with NO sequential greedy state. Exact integers, so
    the plan is deterministic and oracle-checkable.

    Scale shape: the running total is the TWO-PHASE
    ``operators/keys.py:running_total`` (range-repartition + local
    window + broadcast offsets) — no global single-partition window,
    so the planner itself survives a 10^8-file manifest.
    ``path_col`` must be unique (it is a path): the order is total.
    """
    from sfcrimedatapipeline_spark.operators.keys import running_total

    cum = running_total(files, [F.asc(path_col)], bytes_col, "__cum")
    return cum.select(
        *files.columns,
        F.floor(
            (F.col("__cum") - F.col(bytes_col)) / F.lit(float(target_bytes))
        )
        .cast("long")
        .alias("bin_id"),
    )


def compaction_summary(plan: DataFrame, path_col: str, bytes_col: str) -> DataFrame:
    """Per-bin rollup of a :func:`compaction_plan`: file count, total
    bytes, and the path range — what a compaction job scheduler
    consumes (one task per bin, reading [first_file, last_file])."""
    return plan.groupBy("bin_id").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum(bytes_col).cast("long").alias("bin_bytes"),
        F.min(path_col).alias("first_file"),
        F.max(path_col).alias("last_file"),
    )
