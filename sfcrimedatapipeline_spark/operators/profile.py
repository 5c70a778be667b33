"""Table profiling: per-column statistics in ONE pass.

The data-quality step before any pipeline run: row/null/distinct counts
and value ranges per column. The Spark side computes every column's
stats in a single aggregation (one scan, map-side partials; the
multi-``countDistinct`` expand is the standard cost), then unpivots the
1-row result into a tall frame with a driver-free explode. The oracle
recomputes each column's row independently — DuckDB may scan per
column; the one-pass constraint is the SPARK-side scale claim.

Numeric columns only: min/max are emitted as DOUBLE (decimal→double and
int→double conversions are deterministic and identical across engines;
casting values to STRING is not — float formatting differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row per profiled column: n_rows, n_nulls, n_distinct,
    min/max as double."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")
