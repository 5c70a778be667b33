"""Geospatial operators over the incident coordinates the reference
stores on its fact table (Latitude/Longitude, /root/reference/dags/
ELT.py:71-72,259-260 — stored but never analyzed there): grid-cell
hotspot counting and radius self-joins, the two primitives of
crime-hotspot analysis.

Exactness discipline: raw degrees are quantized ONCE to exact integer
1e-5-degree units (``floor(x*1e5 + 0.5)`` — the cents formula), and
everything downstream — grid cells, squared distances, radius
comparisons — is integer arithmetic. Distances use a local planar
(equirectangular) approximation with INTEGER LITERAL weights
(1.11132 m and 0.87851 m per unit at SF's latitude, scaled ×100000)
so no trigonometric function is ever evaluated at runtime: libm
sin/cos last-ulp differences across engines would break the hash gate,
and over a ~15 km city extent the planar error is <0.1%. The only
float op is the final display division/sqrt of an exact integer.

Scale shape: hotspot counting is one map-side-combined groupBy on the
cell id. The radius join is GRID-BLOCKED — each point joins only its
3x3 neighbor cells (cell edge >= radius, so no within-radius pair can
escape the neighborhood) — never an all-pairs cross join; candidate
volume is density x 9 cells per point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 1e-5-degree integer units; weights = metres per unit at 37.77N,
#: scaled by 1e5 and rounded to integer literals (no runtime trig)
UNIT_PER_DEG = 100_000
LAT_W = 111_132   # 1.11132 m per 1e-5 deg latitude, x1e5
LON_W = 87_851    # 1.11132*cos(37.77 deg) m per 1e-5 deg longitude, x1e5
#: longitude units are negative around SF; shift them positive before
#: integer div so Spark's truncating `div` and DuckDB's flooring `//`
#: cannot disagree (they differ only on negative operands)
LON_SHIFT = 20_000_000


def with_grid_cell(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_units: int = 500,
) -> DataFrame:
    """Attach integer unit coordinates and a grid cell id
    (``cell_units`` of 1e-5 deg per cell edge; 500 units = ~555 m
    north-south). NULL coordinates yield NULL cells (excluded from any
    downstream grouping/join by normal NULL semantics)."""
    ilat = F.floor(F.col(lat_col) * UNIT_PER_DEG + F.lit(0.5)).cast("long")
    ilon = F.floor(F.col(lon_col) * UNIT_PER_DEG + F.lit(0.5)).cast("long")
    return df.withColumns(
        {
            "ilat": ilat,
            "ilon": ilon,
            "cell_x": F.expr(f"CAST(floor({lat_col} * {UNIT_PER_DEG} + 0.5) AS BIGINT) div {cell_units}"),
            "cell_y": F.expr(
                f"(CAST(floor({lon_col} * {UNIT_PER_DEG} + 0.5) AS BIGINT) + {LON_SHIFT}) div {cell_units}"
            ),
        }
    )


def grid_hotspots(
    df: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    cell_units: int = 500,
    k: int = 20,
) -> DataFrame:
    """Top-k grid cells by incident count (total order: count DESC,
    cell_x ASC, cell_y ASC) with each cell's centre coordinates in
    degrees — the hotspot map behind the reference's Tableau dashboard
    idea. One groupBy shuffle on the cell id + TakeOrderedAndProject."""
    cells = (
        with_grid_cell(df, lat_col, lon_col, cell_units)
        # both: a row with one NULL coordinate has no cell either
        .filter(F.col("cell_x").isNotNull() & F.col("cell_y").isNotNull())
        .groupBy("cell_x", "cell_y")
        .agg(F.count("*").alias("n_incidents"))
    )
    centre_lat = (F.col("cell_x") * cell_units + F.lit(cell_units) / 2) / UNIT_PER_DEG
    centre_lon = (
        F.col("cell_y") * cell_units - F.lit(LON_SHIFT) + F.lit(cell_units) / 2
    ) / UNIT_PER_DEG
    return (
        cells.select(
            "cell_x",
            "cell_y",
            "n_incidents",
            centre_lat.alias("centre_lat"),
            centre_lon.alias("centre_lon"),
        )
        .orderBy(F.col("n_incidents").desc(), F.col("cell_x").asc(), F.col("cell_y").asc())
        .limit(k)
    )


def radius_pairs(
    df: DataFrame,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius_m: int = 100,
) -> DataFrame:
    """All point pairs within ``radius_m`` metres (id_a < id_b) with
    their planar distance — the spatial self-join behind "incidents
    near each other" clustering.

    Blocked on a grid whose cell edge is >= the radius in BOTH axes
    (longitude units are shorter metres, so the lon edge uses the
    smaller weight): the right side explodes to its 3x3 neighborhood,
    the join is an equi-join on the cell id, and each qualifying pair
    is produced exactly once (a pair's cells are adjacent, and the
    exploded neighborhood holds each cell once; id_a < id_b keeps one
    orientation). The distance predicate is exact:
    ``(dlat*LAT_W)^2 + (dlon*LON_W)^2 <= (radius*1e5)^2`` in BIGINTs.
    """
    # cell edges: radius in integer units per axis, rounded UP so the
    # 3x3 neighborhood is a superset of the radius disc
    lat_units = -(-radius_m * UNIT_PER_DEG // LAT_W)
    lon_units = -(-radius_m * UNIT_PER_DEG // LON_W)
    pts = (
        with_grid_cell(df, lat_col, lon_col, cell_units=1)  # ilat/ilon only
        .filter(F.col("ilat").isNotNull() & F.col("ilon").isNotNull())
        .select(
            F.col(id_col).alias("pid"),
            "ilat",
            "ilon",
            F.expr(f"ilat div {lat_units}").alias("cx"),
            F.expr(f"(ilon + {LON_SHIFT}) div {lon_units}").alias("cy"),
        )
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    right = pts.select(
        F.col("pid").alias("pid_b"),
        F.col("ilat").alias("ilat_b"),
        F.col("ilon").alias("ilon_b"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"), (F.col("cy") + dy).alias("cy")
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("nc"),
    ).select("pid_b", "ilat_b", "ilon_b", F.col("nc.cx").alias("cx"), F.col("nc.cy").alias("cy"))
    r_scaled = radius_m * UNIT_PER_DEG
    d2 = (
        ((F.col("ilat") - F.col("ilat_b")) * LAT_W) * ((F.col("ilat") - F.col("ilat_b")) * LAT_W)
        + ((F.col("ilon") - F.col("ilon_b")) * LON_W) * ((F.col("ilon") - F.col("ilon_b")) * LON_W)
    )
    return (
        pts.join(right, ["cx", "cy"])
        .filter(F.col("pid") < F.col("pid_b"))
        .withColumn("__d2", d2)
        .filter(F.col("__d2") <= F.lit(r_scaled).cast("long") * F.lit(r_scaled).cast("long"))
        .select(
            F.col("pid").alias("id_a"),
            F.col("pid_b").alias("id_b"),
            (F.sqrt(F.col("__d2").cast("double")) / UNIT_PER_DEG).alias("dist_m"),
        )
    )


def grid_density_clusters(
    df: DataFrame,
    ilat_col: str = "ilat",
    ilon_col: str = "ilon",
    cell_units: int = 500,
    min_pts: int = 30,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """DBSCAN-style density clustering on the integer grid: cells with
    >= ``min_pts`` points are dense, 8-adjacent dense cells merge into
    one cluster (connected components, operators/corpus.py), sparse
    cells are noise and excluded. The classic grid relaxation of
    DBSCAN (cell edge plays epsilon; border-point subtleties are
    traded away for an all-equi-join dataflow).

    Returns one row per cluster: ``(cluster_id, n_cells, n_points,
    min_cx, max_cx, min_cy, max_cy)`` — all exact integers, so the
    result hash-gates. ``cluster_id`` = min encoded cell id in the
    cluster.

    Scale shape: one map-side-combined groupBy counts cells (output is
    CELL-cardinality, not point-cardinality — the quadratic never
    exists); adjacency is a 9-way explode of the DENSE cell list
    joined back to itself on the cell key (an equi-join over the
    already-thresholded frame); the component step inherits
    connected_components' one-shuffle-per-round bound on a graph no
    larger than the dense-cell count."""
    from sfcrimedatapipeline_spark.operators.corpus import connected_components

    cells = (
        df.filter(F.col(ilat_col).isNotNull() & F.col(ilon_col).isNotNull())
        .select(
            F.expr(f"{ilat_col} div {cell_units}").alias("cx"),
            F.expr(f"({ilon_col} + {LON_SHIFT}) div {cell_units}").alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_pts)
        # the cell list feeds three consumers (explode side, join side,
        # label join-back); persist so the point scan runs once
        .persist()
    )
    cid = (F.col("cx") * 1_000_000 + F.col("cy")).alias("cid")
    dense = cells.select(cid, "cx", "cy", "n")
    # (0,0) self-pair keeps isolated dense cells in the component map
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    fanout = dense.select(
        F.col("cid").alias("cid_a"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("nx"),
                        (F.col("cy") + dy).alias("ny"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("nb"),
    ).select("cid_a", F.col("nb.nx").alias("cx"), F.col("nb.ny").alias("cy"))
    edges = fanout.join(dense.select("cid", "cx", "cy"), ["cx", "cy"]).select(
        "cid_a", F.col("cid").alias("cid_b")
    )
    labels = connected_components(
        edges, src_col="cid_a", dst_col="cid_b", checkpoint_dir=checkpoint_dir
    ).select(F.col("doc_id").alias("cid"), "canonical_id")
    out = (
        dense.join(labels, "cid")
        .groupBy(F.col("canonical_id").alias("cluster_id"))
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum("n").cast("long").alias("n_points"),
            F.min("cx").cast("long").alias("min_cx"),
            F.max("cx").cast("long").alias("max_cx"),
            F.min("cy").cast("long").alias("min_cy"),
            F.max("cy").cast("long").alias("max_cy"),
        )
    )
    return out


def point_in_polygon_counts(
    points: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
) -> DataFrame:
    """Assign each point to the polygons containing it (ray casting)
    and return per-point membership: ``(id, poly_id)`` for every
    polygon whose boundary an upward ray from the point crosses an odd
    number of times. The district-assignment primitive the reference's
    PdDistrict column implies but never computes.

    ``points``: (id, x, y) in exact integer units (quantize upstream
    with the module's cents formula). ``edges``: (poly_id, x1, y1,
    x2, y2) — one row per polygon edge; polygon tables are tiny
    (boundaries, not data), so the pair space is a BROADCAST
    nested-loop of points x edges — rows x edges comparisons, each a
    few integer ops, with no shuffle of the points beyond the final
    parity groupBy on (id, poly_id).

    Crossing test is EXACT integer arithmetic (the module discipline —
    no division, so no float rounding and no engine divergence):
    the edge straddles the horizontal at py iff ``(y1 <= py) !=
    (y2 <= py)`` (half-open: a vertex exactly at py belongs to the
    edge going up from it, counting each crossing once), and the
    intersection lies strictly right of the point iff the
    cross-multiplied ``(x1-px)(y2-y1) + (x2-x1)(py-y1)`` is positive
    when y2 > y1, negative otherwise. Coordinates up to ~2e7 units
    keep the products < 2^63.
    """
    p = points
    cross = (
        ((F.col("y1") <= F.col("__py")) != (F.col("y2") <= F.col("__py")))
        & (
            F.when(
                F.col("y2") > F.col("y1"),
                (F.col("x1") - F.col("__px")) * (F.col("y2") - F.col("y1"))
                + (F.col("x2") - F.col("x1")) * (F.col("__py") - F.col("y1"))
                > 0,
            ).otherwise(
                (F.col("x1") - F.col("__px")) * (F.col("y2") - F.col("y1"))
                + (F.col("x2") - F.col("x1")) * (F.col("__py") - F.col("y1"))
                < 0
            )
        )
    )
    pts = p.select(
        F.col(id_col),
        F.col("x").alias("__px"),
        F.col("y").alias("__py"),
    )
    return (
        pts.crossJoin(F.broadcast(edges))
        .groupBy(id_col, "poly_id")
        .agg(F.sum(F.when(cross, 1).otherwise(0)).alias("__n_cross"))
        .filter(F.col("__n_cross") % 2 == 1)
        .select(id_col, "poly_id")
    )


def nearest_hub_assign(
    df: DataFrame,
    hubs: list[tuple[int, int, int]],
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """Assign every point to its nearest hub (k fixed facilities —
    stations, depots, serving cells) → per-hub ``(hub_id, n_points,
    rms_dist_m)``. The k-NN-assignment primitive (the same argmin an
    IVF coarse quantizer runs, in 2-D).

    ``hubs`` is ``[(hub_id, ilat, ilon)]`` in 1e-5-degree integer grid
    units (the repo's coordinate discipline). The argmin compares EXACT
    integer squared metric distances — Δlat·LAT_W and Δlon·LON_W
    products, never a float — with ties to the smallest hub_id via one
    ``min(struct(d2, hub_id))``; the per-hub dispersion is the RMS of
    the exact d2 sum (decimal accumulation, ONE divide, ONE
    correctly-rounded sqrt — a float mean-of-sqrts would depend on
    partition order). Scale shape: points × k is an explode over a
    k-row literal, one map-side-combined argmin per point, then the
    k-row hub rollup — two shuffles, the second on a k-bounded key.
    """
    ilat = F.floor(F.col(lat_col) * UNIT_PER_DEG + F.lit(0.5)).cast("long")
    ilon = F.floor(F.col(lon_col) * UNIT_PER_DEG + F.lit(0.5)).cast("long")
    pts = df.filter(
        F.col(lat_col).isNotNull() & F.col(lon_col).isNotNull()
    ).select(F.col(id_col).alias("__pid"), ilat.alias("__la"), ilon.alias("__lo"))
    hub_arr = F.array(
        *[
            F.struct(
                F.lit(h).cast("int").alias("hub_id"),
                F.lit(la).cast("long").alias("hla"),
                F.lit(lo).cast("long").alias("hlo"),
            )
            for h, la, lo in hubs
        ]
    )
    ex = pts.select("__pid", "__la", "__lo", F.explode(hub_arr).alias("h"))
    dla = (F.col("__la") - F.col("h.hla")) * F.lit(LAT_W)
    dlo = (F.col("__lo") - F.col("h.hlo")) * F.lit(LON_W)
    d2 = (
        dla.cast("decimal(38,0)") * dla.cast("decimal(38,0)")
        + dlo.cast("decimal(38,0)") * dlo.cast("decimal(38,0)")
    )
    best = ex.groupBy("__pid").agg(
        F.min(F.struct(d2.alias("d2"), F.col("h.hub_id").alias("hub_id"))).alias(
            "m"
        )
    )
    per_hub = best.groupBy(F.col("m.hub_id").alias("hub_id")).agg(
        F.count("*").cast("long").alias("n_points"),
        F.sum(F.col("m.d2")).alias("__sd2"),  # exact decimal sum
    )
    rms = (
        F.sqrt(
            F.col("__sd2").cast("double") / F.col("n_points").cast("double")
        )
        / F.lit(100000.0)
    )
    return per_hub.select(
        "hub_id", "n_points", rms.alias("rms_dist_m")
    ).orderBy("hub_id")
