"""Unit tests for the dependency-free geo kit: WKT parsing, ray
casting (incl. non-convex + holes), centroid, grid index."""

from __future__ import annotations

import numpy as np
import pytest

from open_energy_data_server_spark.functions.geo import (
    parse_wkt_polygon,
    points_in_polygon,
    polygon_bbox,
    polygon_centroid,
)
from open_energy_data_server_spark.operators.spatial import polygon_grid_index


def test_parse_wkt_with_hole():
    rings = parse_wkt_polygon(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    assert len(rings) == 2 and rings[0].shape == (5, 2)
    with pytest.raises(ValueError):
        parse_wkt_polygon("LINESTRING (0 0, 1 1)")


def test_ray_cast_square_and_hole():
    rings = parse_wkt_polygon(
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
    )
    x = np.array([5.0, 1.0, 11.0, 5.0])
    y = np.array([5.0, 1.0, 5.0, 3.0])
    # center is inside the hole → excluded; (1,1) inside; (11,5) outside
    assert list(points_in_polygon(rings, x, y)) == [False, True, False, True]


def test_ray_cast_nonconvex():
    # U-shape: the notch (5, 8) is outside
    rings = parse_wkt_polygon(
        "POLYGON ((0 0, 10 0, 10 10, 7 10, 7 3, 3 3, 3 10, 0 10, 0 0))"
    )
    x = np.array([5.0, 1.5, 8.5, 5.0])
    y = np.array([8.0, 9.0, 9.0, 1.0])
    assert list(points_in_polygon(rings, x, y)) == [False, True, True, True]


def test_centroid_rect_and_triangle():
    rect = parse_wkt_polygon("POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))")
    assert polygon_centroid(rect) == (2.0, 1.0)
    tri = parse_wkt_polygon("POLYGON ((0 0, 3 0, 0 3, 0 0))")
    cx, cy = polygon_centroid(tri)
    assert abs(cx - 1.0) < 1e-12 and abs(cy - 1.0) < 1e-12
    assert polygon_bbox(rect) == (0.0, 0.0, 4.0, 2.0)


def test_polygon_grid_index(spark):
    polys = spark.createDataFrame(
        [(1, "POLYGON ((0.1 0.1, 1.9 0.1, 1.9 0.9, 0.1 0.9, 0.1 0.1))")], "pid int, wkt string"
    )
    cells = {(r.cell_x, r.cell_y) for r in polygon_grid_index(polys, "pid", "wkt", 1.0).collect()}
    assert cells == {(0, 0), (1, 0)}


def test_concave_hull_carves_notch_and_contains_all():
    """kNN concave hull on an L-shaped cloud: meaningfully tighter than
    the convex hull, still encloses every point; degenerate inputs fall
    back (triangle passthrough, collinear-heavy → convex)."""
    import numpy as np

    from open_energy_data_server_spark.functions.geo import (
        concave_hull_wkt,
        convex_hull_wkt,
        parse_wkt_polygon,
        points_in_polygon,
    )

    def area(wkt):
        ring = parse_wkt_polygon(wkt)[0]
        x, y = ring[:-1, 0], ring[:-1, 1]
        xn, yn = ring[1:, 0], ring[1:, 1]
        return abs((x * yn - xn * y).sum()) / 2

    rng = np.random.default_rng(7)
    pts = []
    while len(pts) < 400:
        x, y = rng.uniform(0, 3), rng.uniform(0, 3)
        if x <= 1 or y <= 1:
            pts.append((round(float(x), 4), round(float(y), 4)))
    cw, vw = concave_hull_wkt(pts, k=8), convex_hull_wkt(pts)
    assert area(cw) < area(vw) * 0.85
    ring = parse_wkt_polygon(cw)[0]
    arr = np.array(pts)
    inside = points_in_polygon([ring], arr[:, 0], arr[:, 1])
    on_ring = np.array([tuple(p) in {tuple(r) for r in ring} for p in pts])
    assert bool(np.all(inside | on_ring))

    tri = concave_hull_wkt([(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)])
    assert tri.startswith("POLYGON")


def test_nearest_point_join_semantics(spark):
    """Hand-checkable assignment incl. an exact tie broken to the
    lowest station id, and the zero-shuffle plan contract."""
    import pytest
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.spatial import nearest_point_join

    stations = [(1, 0.0, 0.0), (2, 10.0, 0.0), (3, 0.0, 10.0)]
    pts = local_df(
        spark,
        [(1, 1.0, 1.0), (2, 9.0, 1.0), (3, 5.0, 0.0), (4, 0.5, 9.0)],
        "pid int, lon double, lat double",
    )
    out = {r["pid"]: (r["station_id"], r["d2"])
           for r in nearest_point_join(pts, "lon", "lat", stations).collect()}
    assert out[1] == (1, 2.0)
    assert out[2] == (2, 2.0)
    assert out[3] == (1, 25.0)   # exact tie 1 vs 2 -> lowest id
    assert out[4][0] == 3

    plan = (
        nearest_point_join(pts, "lon", "lat", stations)
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Exchange" not in plan

    with pytest.raises(ValueError):
        nearest_point_join(pts, "lon", "lat", [])


def test_polygon_areas_drops_degenerate_rings(spark):
    """<2-vertex / unparseable rings are omitted (matching the SQL
    twin's GROUP BY), valid rings get exact shoelace areas."""
    from open_energy_data_server_spark.operators.spatial import polygon_areas

    df = spark.createDataFrame(
        [
            (1, "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),  # area 100
            (2, "POLYGON ((5 5))"),  # degenerate: 1 vertex
            (3, "not wkt at all"),  # unparseable
        ],
        "pid int, wkt string",
    )
    rows = {r["pid"]: r["area"] for r in polygon_areas(df, "pid", "wkt").collect()}
    assert rows == {1: 100.0}


def test_shoelace_parse_survives_malformed_coordinate_text(spark):
    """Junk WKT with >=2 comma groups (try_cast -> NULL vertices) and
    non-WKT strings drop from BOTH shoelace operators instead of
    killing the query with an ANSI cast error."""
    from open_energy_data_server_spark.operators.spatial import (
        centroids,
        polygon_areas,
    )

    df = spark.createDataFrame(
        [
            (1, "POLYGON ((0 0, 4 0, 4 2, 0 2, 0 0))"),
            (2, "POLYGON ((a b, c d))"),  # unparseable coords
            (3, "not wkt at all"),
            (4, "POLYGON ((1 2 3, 4 5 6))"),  # 3D vertices -> dropped
        ],
        "pid int, wkt string",
    )
    areas = {r["pid"]: r["area"] for r in polygon_areas(df, "pid", "wkt").collect()}
    assert areas == {1: 8.0}
    cents = {r["pid"]: (r["centroid_lon"], r["centroid_lat"]) for r in centroids(df, "pid", "wkt").collect()}
    assert set(cents) == {1} and cents[1] == (2.0, 1.0)
