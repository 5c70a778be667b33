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


def exact_quantiles(df: DataFrame, col: str, probs: list[float]) -> DataFrame:
    """Exact linear-interpolation quantiles of a numeric column,
    computed distributed (no driver collect, no approximation).

    Spark's global ``orderBy`` range-partitions then sorts per
    partition — the standard distributed sort; ``row_number`` over it
    is the only single-lineage step and carries just (rank, value)
    pairs. For each prob p: position h = p·(n-1) (0-based), value =
    v[floor(h)] + (v[ceil(h)] - v[floor(h)])·(h - floor(h)) — the
    EXPLICIT formula, written identically in the DuckDB oracle, because
    the built-ins (`percentile` vs `quantile_cont`) use algebraically
    equal but differently-rounded expressions that can diverge in the
    last ulp. Engine-identical arithmetic: h is a product of exact
    doubles, the interpolation is 3 IEEE ops in a fixed order.
    """
    from pyspark.sql import Window

    ranked = df.select(F.col(col).cast("double").alias("__v")).select(
        "__v", (F.row_number().over(Window.orderBy("__v")) - 1).alias("__r")
    )
    n = df.count()  # driver scalar (an aggregate, not a row collect)

    spots: dict[float, tuple[int, int, float]] = {}
    for p in probs:
        h = p * (n - 1)
        lo = int(h // 1)
        spots[p] = (lo, min(lo + 1, n - 1), h - (h // 1))
    positions = sorted({x for lo, hi, _ in spots.values() for x in (lo, hi)})

    # ONE filtered pass + ONE conditional aggregation — the sort runs
    # once regardless of how many probs are requested
    row = ranked.filter(F.col("__r").isin(positions)).agg(
        *[
            F.min(F.when(F.col("__r") == pos, F.col("__v"))).alias(f"__v_{pos}")
            for pos in positions
        ]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(p).alias("prob"),
                (
                    F.col(f"__v_{lo}")
                    + (F.col(f"__v_{hi}") - F.col(f"__v_{lo}")) * F.lit(frac)
                ).alias("value"),
            )
            for p, (lo, hi, frac) in sorted(spots.items())
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")


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
