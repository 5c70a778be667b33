"""Timeseries queries over ``events``: spine gap-fill with LOCF and
time-weighted averaging (operators/temporal.py). Both use exact
integer-microsecond epoch arithmetic (Spark ``unix_micros`` ↔ DuckDB
``epoch_us``) — double epoch truncation differs across engines and is
banned here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from sfcrimedatapipeline_spark.functions.partitioning import ensure_min_partitions
from sfcrimedatapipeline_spark.operators import temporal
from sfcrimedatapipeline_spark.plans.tpch import QueryFn
from sfcrimedatapipeline_spark.sources.tables import read_table

BUCKET_SECONDS = 3600
_BUCKET_US = BUCKET_SECONDS * 1_000_000


def events_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly spine per user with last-observation-carried-forward fill
    (operators/temporal.py:resample_locf)."""
    ev = ensure_min_partitions(read_table(spark, sf_dir, "events"))
    return temporal.resample_locf(ev, bucket_seconds=BUCKET_SECONDS)


def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted mean value
    (operators/temporal.py:time_weighted_avg)."""
    ev = ensure_min_partitions(read_table(spark, sf_dir, "events"))
    return temporal.time_weighted_avg(ev)


QUERIES: dict[str, QueryFn] = {
    "events_resample_locf": events_resample_locf,
    "events_time_weighted_avg": events_time_weighted_avg,
}

ORACLE_SQL: dict[str, str] = {
    "events_resample_locf": f"""
        WITH ev AS (
            SELECT user_id, epoch_us(ts) AS mu,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
        ),
        obs AS (
            SELECT user_id, b, cents AS obs_cents FROM (
                SELECT user_id, mu // {_BUCKET_US} AS b, cents,
                       row_number() OVER (PARTITION BY user_id, mu // {_BUCKET_US}
                                          ORDER BY mu DESC, cents DESC) AS rn
                FROM ev) t
            WHERE rn = 1
        ),
        span AS (
            SELECT user_id, min(mu) // {_BUCKET_US} AS b0,
                   max(mu) // {_BUCKET_US} AS b1
            FROM ev GROUP BY 1
        ),
        spine AS (
            SELECT user_id, unnest(generate_series(b0, b1)) AS b FROM span
        )
        SELECT s.user_id,
               make_timestamp(s.b * {_BUCKET_US}) AS bucket_ts,
               o.obs_cents,
               last_value(o.obs_cents IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.b
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents
        FROM spine s
        LEFT JOIN obs o ON s.user_id = o.user_id AND s.b = o.b
    """,
    "events_time_weighted_avg": """
        WITH ev AS (
            SELECT user_id, epoch_us(ts) AS mu,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
            FROM events
        ),
        seg AS (
            SELECT user_id, cents,
                   lead(mu) OVER (PARTITION BY user_id
                                  ORDER BY mu ASC, cents ASC) - mu AS dt_us
            FROM ev
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(sum(dt_us) AS BIGINT) AS total_us,
               CAST(sum(CAST(cents AS DECIMAL(38,0)) * dt_us) AS DOUBLE)
                   / CAST(sum(dt_us) AS DOUBLE) AS twa_cents
        FROM seg WHERE dt_us IS NOT NULL
        GROUP BY 1
    """,
}
