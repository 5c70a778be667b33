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
