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

from sfcrimedatapipeline_spark.operators import geo
from sfcrimedatapipeline_spark.plans.tpch import QueryFn
from sfcrimedatapipeline_spark.sources.tables import read_table

HOTSPOT_CELL_UNITS = 500   # ~555 m north-south
HOTSPOT_K = 20
RADIUS_M = 10


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sfcrimedatapipeline_spark.plans.fact_queries import _staging_from_events

    # no fan-out repartition (OPTIMIZATION r12, guide §2.4): the
    # repartition sat ABOVE this projection, so it never parallelized
    # the per-row staging work — it only fed the downstream grid
    # arithmetic, which shuffles into its groupBy/join immediately.
    # Measured at sf0.1 (3-rep medians): radius_pairs 1.64 -> 1.16 s,
    # grid_hotspots 0.88 -> 0.42 s without it.
    staging = _staging_from_events(spark, sf_dir)
    return staging.select(
        F.col("id"),
        F.col("Latitude").alias("lat"),
        F.col("Longitude").alias("lon"),
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


DBSCAN_CELL_UNITS = 500
DBSCAN_MIN_PTS = 30


def _blob_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic clustered point set in integer 1e-5-degree units: 50
    blobs (one per ``user_id % 50``) on a 1300x1500-unit center grid
    with +-200-unit md5 scatter, plus full-extent noise for every 10th
    event. The staging lattice (_points) is a 1-D modular curve —
    every cell it touches is EQUALLY dense, so a density threshold
    can't separate anything; clustering needs blobs AND background.
    All placement is md5-slice arithmetic (operators/corpus.py's
    uniform-coin idiom), so the oracle re-derives identical points."""
    e = read_table(spark, sf_dir, "events").select("event_id", "user_id")

    def hslice(pos: int) -> F.Column:
        return F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), pos, 8), 16, 10
        ).cast("long")

    u = F.col("user_id") % 50
    blob_lat = F.lit(3_770_000) + (u % 10) * 1300 + (hslice(1) % 401 - 200)
    blob_lon = (
        F.lit(-12_251_000)
        + F.expr("(user_id % 50) div 10") * 1500
        + (hslice(9) % 401 - 200)
    )
    noise_lat = F.lit(3_770_000) + hslice(17) % 13000
    noise_lon = F.lit(-12_251_000) + hslice(25) % 15000
    is_noise = F.col("event_id") % 10 == 0
    # no fan-out repartition (see _points): the md5 placement math runs
    # in the scan stage BELOW where the repartition sat, and the
    # density clustering shuffles into its cell groupBy immediately —
    # measured 2.83 -> 2.13 s at sf0.1 without the exchange
    return e.select(
        F.col("event_id").alias("pid"),
        F.when(is_noise, noise_lat).otherwise(blob_lat).alias("ilat"),
        F.when(is_noise, noise_lon).otherwise(blob_lon).alias("ilon"),
    )


def geo_dbscan_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-density (DBSCAN-style) clusters of the blob point set
    (operators/geo.py:grid_density_clusters): ~555 m cells, dense at
    >= 30 points, 8-adjacency merge; noise cells dropped. The oracle
    recomputes the components by brute-force |dense|^2 adjacency +
    recursive closure — a different algorithm, so the gate validates
    the explode-join adjacency itself."""
    return geo.grid_density_clusters(
        _blob_points(spark, sf_dir),
        cell_units=DBSCAN_CELL_UNITS,
        min_pts=DBSCAN_MIN_PTS,
    )


#: synthetic district boundaries in exact integer 1e-5-degree units
#: (y = ilat, x = ilon) over the staging lattice extent — rectangle,
#: non-convex L-shape, and a triangle overlapping both, so the parity
#: test is exercised on >1 crossing and on multi-membership points.
#: ONE constant generates the Spark edge frame AND the oracle VALUES.
DISTRICT_POLYGONS: dict[int, list[tuple[int, int]]] = {
    1: [
        (-12_250_000, 3_771_000),
        (-12_244_000, 3_771_000),
        (-12_244_000, 3_776_000),
        (-12_250_000, 3_776_000),
    ],
    # L-shape straddling the sf0.01 diagonal (ids <= 10k put every
    # point on y = x + 16_021_000): the notch cuts ids ~6000-6500 out
    # of the 6000-9000 band only when y < 3_776_500, so the concavity
    # is load-bearing at both scale factors
    2: [
        (-12_245_000, 3_775_500),
        (-12_242_000, 3_775_500),
        (-12_242_000, 3_782_000),
        (-12_244_000, 3_782_000),
        (-12_244_000, 3_776_500),
        (-12_245_000, 3_776_500),
    ],
    3: [
        (-12_249_000, 3_777_000),
        (-12_238_000, 3_777_000),
        (-12_244_000, 3_782_500),
    ],
}


def _district_edges() -> list[tuple[int, int, int, int, int]]:
    out = []
    for pid, ring in sorted(DISTRICT_POLYGONS.items()):
        for i, (x1, y1) in enumerate(ring):
            x2, y2 = ring[(i + 1) % len(ring)]
            out.append((pid, x1, y1, x2, y2))
    return out


def geo_district_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon district assignment
    (operators/geo.py:point_in_polygon_counts, exact-integer ray
    casting): how many incidents fall inside each synthetic district
    boundary. The oracle recomputes the same parity test as a plain
    CROSS JOIN over a VALUES edge list generated from the SAME
    constant — a wrong crossing rule or a lost multi-membership point
    shows as a count mismatch."""
    from sfcrimedatapipeline_spark.operators.geo import point_in_polygon_counts

    pts = (
        _points(spark, sf_dir)
        .filter(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .select(
            F.col("id"),
            F.floor(F.col("lon") * 100000 + F.lit(0.5)).cast("long").alias("x"),
            F.floor(F.col("lat") * 100000 + F.lit(0.5)).cast("long").alias("y"),
        )
    )
    edges = spark.createDataFrame(
        _district_edges(), "poly_id int, x1 long, y1 long, x2 long, y2 long"
    )
    inside = point_in_polygon_counts(pts, edges, id_col="id")
    return inside.groupBy("poly_id").agg(F.count("*").alias("n_points"))


QUERIES: dict[str, QueryFn] = {
    "geo_grid_hotspots": geo_grid_hotspots,
    "geo_radius_pairs": geo_radius_pairs,
    "geo_dbscan_clusters": geo_dbscan_clusters,
    "geo_district_assign": geo_district_assign,
}


def _district_oracle_sql() -> str:
    """DuckDB twin generated from DISTRICT_POLYGONS — same edges, same
    exact-integer crossing rule."""
    values = ",\n               ".join(
        f"({p}, {x1}, {y1}, {x2}, {y2})"
        for p, x1, y1, x2, y2 in _district_edges()
    )
    num = "(e.x1 - p.ilon) * (e.y2 - e.y1) + (e.x2 - e.x1) * (p.ilat - e.y1)"
    return f"""
        WITH {_PTS},
        edges(poly_id, x1, y1, x2, y2) AS (
            VALUES {values}
        ),
        c AS (
            SELECT p.pid, e.poly_id,
                   sum(CASE WHEN ((e.y1 <= p.ilat) <> (e.y2 <= p.ilat))
                             AND (CASE WHEN e.y2 > e.y1
                                       THEN {num} > 0
                                       ELSE {num} < 0 END)
                        THEN 1 ELSE 0 END) AS n_cross
            FROM pts p CROSS JOIN edges e
            GROUP BY 1, 2
        )
        SELECT CAST(poly_id AS INTEGER) AS poly_id,
               count(*) AS n_points
        FROM c WHERE n_cross % 2 = 1
        GROUP BY 1
    """

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
    "geo_district_assign": _district_oracle_sql(),
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
    "geo_dbscan_clusters": f"""
        WITH RECURSIVE hx AS (
            SELECT event_id, user_id,
                   md5(CAST(event_id AS VARCHAR)) AS h
            FROM events
        ),
        bpts AS (
            SELECT event_id AS pid,
                   CASE WHEN event_id % 10 = 0
                        THEN 3770000
                             + CAST(('0x' || substring(h, 17, 8)) AS BIGINT) % 13000
                        ELSE 3770000 + (user_id % 50 % 10) * 1300
                             + (CAST(('0x' || substring(h, 1, 8)) AS BIGINT) % 401 - 200)
                   END AS ilat,
                   CASE WHEN event_id % 10 = 0
                        THEN -12251000
                             + CAST(('0x' || substring(h, 25, 8)) AS BIGINT) % 15000
                        ELSE -12251000 + (user_id % 50 // 10) * 1500
                             + (CAST(('0x' || substring(h, 9, 8)) AS BIGINT) % 401 - 200)
                   END AS ilon
            FROM hx
        ),
        dense AS (
            SELECT (ilat // {DBSCAN_CELL_UNITS}) * 1000000
                   + (ilon + {geo.LON_SHIFT}) // {DBSCAN_CELL_UNITS} AS cid,
                   ilat // {DBSCAN_CELL_UNITS} AS cx,
                   (ilon + {geo.LON_SHIFT}) // {DBSCAN_CELL_UNITS} AS cy,
                   count(*) AS n
            FROM bpts GROUP BY 1, 2, 3
            HAVING count(*) >= {DBSCAN_MIN_PTS}
        ),
        adj AS (
            SELECT a.cid AS src, b.cid AS dst
            FROM dense a JOIN dense b
              ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        ),
        reach(id, r) AS (
            SELECT cid, cid FROM dense
            UNION
            SELECT reach.id, adj.dst FROM reach JOIN adj ON reach.r = adj.src
        ),
        lab AS (SELECT id AS cid, min(r) AS cluster_id FROM reach GROUP BY id)
        SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(sum(n) AS BIGINT) AS n_points,
               CAST(min(cx) AS BIGINT) AS min_cx,
               CAST(max(cx) AS BIGINT) AS max_cx,
               CAST(min(cy) AS BIGINT) AS min_cy,
               CAST(max(cy) AS BIGINT) AS max_cy
        FROM dense JOIN lab USING (cid)
        GROUP BY 1
    """,
}


#: five fixed hubs spread across the synthetic coordinate box
#: (ilat 3,770,000..3,783,000; ilon -12,251,000..-12,236,000)
HUBS: list[tuple[int, int, int]] = [
    (1, 3_772_000, -12_249_000),
    (2, 3_775_000, -12_244_000),
    (3, 3_778_000, -12_239_000),
    (4, 3_781_000, -12_247_000),
    (5, 3_773_500, -12_237_500),
]


def geo_nearest_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-facility assignment (operators/geo.py:nearest_hub_assign):
    every incident to its closest of five fixed hubs by exact integer
    squared metric distance, per-hub counts + RMS distance — the 2-D
    coarse-quantizer argmin, hash-gated against the same arithmetic in
    SQL."""
    return geo.nearest_hub_assign(_points(spark, sf_dir), HUBS)


QUERIES["geo_nearest_hub"] = geo_nearest_hub


def _nearest_hub_oracle_sql() -> str:
    values = ",\n               ".join(f"({h}, {la}, {lo})" for h, la, lo in HUBS)
    d2 = (
        f"CAST((p.ilat - h.hla) * {geo.LAT_W} AS DECIMAL(38,0))"
        f" * CAST((p.ilat - h.hla) * {geo.LAT_W} AS DECIMAL(38,0))"
        f" + CAST((p.ilon - h.hlo) * {geo.LON_W} AS DECIMAL(38,0))"
        f" * CAST((p.ilon - h.hlo) * {geo.LON_W} AS DECIMAL(38,0))"
    )
    return f"""
        WITH {_PTS},
        hubs(hub_id, hla, hlo) AS (VALUES {values}),
        d AS (
            SELECT p.pid, h.hub_id, {d2} AS d2
            FROM pts p CROSS JOIN hubs h
        ),
        best AS (
            SELECT pid, hub_id, d2 FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY pid ORDER BY d2 ASC, hub_id ASC) AS rn
                FROM d
            ) WHERE rn = 1
        )
        SELECT CAST(hub_id AS INTEGER) AS hub_id,
               CAST(count(*) AS BIGINT) AS n_points,
               sqrt(CAST(sum(d2) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                   / 100000.0 AS rms_dist_m
        FROM best GROUP BY hub_id ORDER BY hub_id
    """


ORACLE_SQL["geo_nearest_hub"] = _nearest_hub_oracle_sql()
