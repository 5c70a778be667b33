"""Geospatial queries over the incident coordinates (operators/geo.py)
on the events-derived staging frame — the Latitude/Longitude columns
the reference stores on FactCrime (/root/reference/dags/ELT.py:259-260)
but never analyzes; these are the hotspot-map and proximity analyses a
crime dashboard actually runs.

The point set reuses fact_queries' staging coordinate derivation
(plans/fact_queries.py:_staging_from_events — 37.70 + (id%13000)/1e5
etc., NULL every 19th row); the oracles re-derive the same points from
``events`` with the identical formula. The radius-join oracle is the
BRUTE-FORCE O(n²) self-join — deliberately a different algorithm than
the Spark side's grid-blocked join, so the gate validates the blocking
logic itself (a missed neighbor cell would show as a row-count
mismatch), not just the arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfcrimedatapipeline_spark.functions.partitioning import ensure_min_partitions
from sfcrimedatapipeline_spark.operators import geo
from sfcrimedatapipeline_spark.plans.tpch import QueryFn
from sfcrimedatapipeline_spark.sources.tables import read_table

HOTSPOT_CELL_UNITS = 500   # ~555 m north-south
HOTSPOT_K = 20
RADIUS_M = 10


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sfcrimedatapipeline_spark.plans.fact_queries import _staging_from_events

    # reuse the staging derivation; ensure_min_partitions for local cores
    staging = _staging_from_events(spark, sf_dir)
    return ensure_min_partitions(
        staging.select(
            F.col("id"),
            F.col("Latitude").alias("lat"),
            F.col("Longitude").alias("lon"),
        )
    )


def geo_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 ~555 m grid cells by incident count
    (operators/geo.py:grid_hotspots)."""
    return geo.grid_hotspots(
        _points(spark, sf_dir), cell_units=HOTSPOT_CELL_UNITS, k=HOTSPOT_K
    )


def geo_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All incident pairs within 10 m, grid-blocked
    (operators/geo.py:radius_pairs)."""
    return geo.radius_pairs(_points(spark, sf_dir), id_col="id", radius_m=RADIUS_M)


QUERIES: dict[str, QueryFn] = {
    "geo_grid_hotspots": geo_grid_hotspots,
    "geo_radius_pairs": geo_radius_pairs,
}

_PTS = """
    pts AS (
        SELECT event_id AS pid,
               CAST(floor((37.70 + (event_id % 13000) / 100000.0) * 100000 + 0.5)
                    AS BIGINT) AS ilat,
               CAST(floor((-122.51 + (event_id % 15000) / 100000.0) * 100000 + 0.5)
                    AS BIGINT) AS ilon
        FROM events WHERE event_id % 19 <> 0
    )
"""

ORACLE_SQL: dict[str, str] = {
    "geo_grid_hotspots": f"""
        WITH {_PTS},
        cells AS (
            SELECT ilat // {HOTSPOT_CELL_UNITS} AS cell_x,
                   (ilon + {geo.LON_SHIFT}) // {HOTSPOT_CELL_UNITS} AS cell_y,
                   count(*) AS n_incidents
            FROM pts GROUP BY 1, 2
        )
        SELECT cell_x, cell_y, n_incidents,
               (cell_x * {HOTSPOT_CELL_UNITS} + {HOTSPOT_CELL_UNITS} / 2.0)
                   / 100000.0 AS centre_lat,
               (cell_y * {HOTSPOT_CELL_UNITS} - {geo.LON_SHIFT}
                + {HOTSPOT_CELL_UNITS} / 2.0) / 100000.0 AS centre_lon
        FROM cells
        ORDER BY n_incidents DESC, cell_x ASC, cell_y ASC
        LIMIT {HOTSPOT_K}
    """,
    "geo_radius_pairs": f"""
        WITH {_PTS}
        SELECT a.pid AS id_a, b.pid AS id_b,
               sqrt(CAST((a.ilat - b.ilat) * {geo.LAT_W} * ((a.ilat - b.ilat) * {geo.LAT_W})
                         + (a.ilon - b.ilon) * {geo.LON_W} * ((a.ilon - b.ilon) * {geo.LON_W})
                    AS DOUBLE)) / 100000.0 AS dist_m
        FROM pts a JOIN pts b ON a.pid < b.pid
        WHERE (a.ilat - b.ilat) * {geo.LAT_W} * ((a.ilat - b.ilat) * {geo.LAT_W})
              + (a.ilon - b.ilon) * {geo.LON_W} * ((a.ilon - b.ilon) * {geo.LON_W})
              <= CAST({RADIUS_M} * 100000 AS BIGINT) * CAST({RADIUS_M} * 100000 AS BIGINT)
    """,
}
