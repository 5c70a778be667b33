"""Geo operator edge tests: cell-boundary pairs, exact-radius
boundaries, NULL coordinates. The driver gate already proves the
grid-blocked join against a brute-force O(n²) oracle at sf0.01."""

from __future__ import annotations


def test_radius_pairs_straddling_cell_boundary(spark):
    from sfcrimedatapipeline_spark.operators.geo import UNIT_PER_DEG, radius_pairs

    # two points 2 units apart in latitude (~2.2 m) placed so a cell
    # boundary falls between them — the 3x3 neighborhood must still
    # pair them; a third point far away pairs with nobody; NULL
    # coordinates are dropped
    rows = [
        (1, 37.70008, -122.51),
        (2, 37.70010, -122.51),
        (3, 37.80, -122.40),
        (4, None, -122.51),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = radius_pairs(df, radius_m=10).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}
    d = out[0].dist_m
    assert abs(d - 2 * 111132 / UNIT_PER_DEG / 100000 * UNIT_PER_DEG) < 0.01
    assert 2.0 < d < 2.5  # ~2.22 m


def test_radius_boundary_is_inclusive_exact(spark):
    from sfcrimedatapipeline_spark.operators.geo import radius_pairs

    # dlat of 9 units * 111132 = 1000188 > 10m*100000 → excluded;
    # 8 units * 111132 = 889056 <= 1000000 → included. Integer
    # comparison, no float boundary ambiguity.
    rows = [
        (1, 37.70000, -122.51),
        (2, 37.70008, -122.51),   # 8 units
        (3, 37.70009, -122.51),   # 9 units from id 1
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    pairs = {(r.id_a, r.id_b) for r in radius_pairs(df, radius_m=10).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs
    assert (2, 3) in pairs  # 1 unit apart


def test_grid_hotspots_counts_and_centres(spark):
    from sfcrimedatapipeline_spark.operators.geo import grid_hotspots

    # 3 points in one cell, 1 in another → top cell n=3
    # all three in one cell (cell edges at 500-unit = 0.005-degree
    # multiples; 37.7010-37.7012 and -122.5101..-122.5102 stay inside)
    rows = [
        (1, 37.7010, -122.5101),
        (2, 37.7011, -122.51015),
        (3, 37.7012, -122.5102),
        (4, 37.75, -122.45),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = grid_hotspots(df, cell_units=500, k=10).collect()
    assert out[0].n_incidents == 3
    # the centre must sit inside the cell that contains the points
    assert abs(out[0].centre_lat - 37.701) < 0.005
    assert abs(out[0].centre_lon + 122.510) < 0.005
    assert len(out) == 2


def test_hotspots_drop_half_null_coordinates(spark):
    from sfcrimedatapipeline_spark.operators.geo import grid_hotspots

    rows = [
        (1, 37.70, -122.51),
        (2, 37.70, None),    # half-NULL: no cell
        (3, None, -122.51),
    ]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    out = grid_hotspots(df, cell_units=500, k=10).collect()
    assert len(out) == 1 and out[0].n_incidents == 1


def test_grid_density_clusters_merge_and_noise(spark):
    from sfcrimedatapipeline_spark.operators.geo import (
        LON_SHIFT,
        grid_density_clusters,
    )

    # integer unit coords. cell_units=10, min_pts=3.
    # cluster A: two ADJACENT dense cells (0,0) and (10,0) -> cx 0 and 1
    # isolated dense cell far away at (50,50) -> cx 5
    # noise: 2 points in a cell (below min_pts), and a NULL row
    rows = (
        [(i, 0 + i % 3, 0) for i in range(3)]            # cell (0, s)
        + [(10 + i, 10 + i % 3, 0) for i in range(3)]    # cell (1, s)
        + [(20 + i, 50, 50) for i in range(3)]           # cell (5, s+5)
        + [(30, 90, 90), (31, 90, 90)]                    # sparse: only 2
        + [(32, None, None)]
    )
    df = spark.createDataFrame(rows, "pid long, ilat long, ilon long")
    out = {
        r.cluster_id: r
        for r in grid_density_clusters(df, cell_units=10, min_pts=3).collect()
    }
    assert len(out) == 2
    shift_cy = LON_SHIFT // 10
    merged = out[0 * 1_000_000 + shift_cy]
    assert merged.n_cells == 2 and merged.n_points == 6
    assert (merged.min_cx, merged.max_cx) == (0, 1)
    iso = out[5 * 1_000_000 + shift_cy + 5]
    assert iso.n_cells == 1 and iso.n_points == 3


def test_grid_density_clusters_diagonal_adjacency(spark):
    from sfcrimedatapipeline_spark.operators.geo import (
        LON_SHIFT,
        grid_density_clusters,
    )

    # diagonal neighbors (0,0) and (1,1) must merge (8-adjacency)
    rows = [(i, 0, 0) for i in range(3)] + [(10 + i, 10, 10) for i in range(3)]
    df = spark.createDataFrame(rows, "pid long, ilat long, ilon long")
    out = grid_density_clusters(df, cell_units=10, min_pts=3).collect()
    assert len(out) == 1 and out[0].n_cells == 2 and out[0].n_points == 6
