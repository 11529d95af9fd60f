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

    # station list deliberately NOT in sid order: the tie rule is
    # lowest sid, not first-listed
    stations = [(2, 10.0, 0.0), (1, 0.0, 0.0), (3, 0.0, 10.0)]
    pts = local_df(
        spark,
        [(1, 1.0, 1.0), (2, 9.0, 1.0), (3, 5.0, 0.0), (4, 0.5, 9.0),
         (5, None, 1.0), (6, 9.0, None)],
        "pid int, lon double, lat double",
    )
    out = {r["pid"]: (r["station_id"], r["d2"])
           for r in nearest_point_join(pts, "lon", "lat", stations).collect()}
    assert out[1] == (1, 2.0)
    assert out[2] == (2, 2.0)
    assert out[3] == (1, 25.0)   # exact tie 1 vs 2 -> lowest id
    assert out[4][0] == 3
    # NULL coordinate -> lowest sid with NULL d2 (the pre-round-10
    # struct-sort behavior, preserved by the codegen argmin rewrite)
    assert out[5] == (1, None)
    assert out[6] == (1, None)

    plan = (
        nearest_point_join(pts, "lon", "lat", stations)
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Exchange" not in plan

    with pytest.raises(ValueError):
        nearest_point_join(pts, "lon", "lat", [])

    # round-10 ADVICE: duplicate station ids would silently keep only
    # the last coordinate — must raise instead
    with pytest.raises(ValueError, match="duplicate station ids"):
        nearest_point_join(
            pts, "lon", "lat", [(1, 0.0, 0.0), (1, 5.0, 5.0)]
        )
    # O(n²) plan-size guard: oversized station lists must be rejected
    # toward the documented pre-bucketing path
    with pytest.raises(ValueError, match="pre-bucket"):
        nearest_point_join(
            pts, "lon", "lat",
            [(i, float(i), 0.0) for i in range(257)],
        )


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


def test_mercator_transform_known_points():
    """EPSG:4326 ↔ 3857 against canonical published values."""
    from open_energy_data_server_spark.functions.geo import transform_ring

    ring = np.array([[10.0, 50.0], [0.0, 0.0], [-73.9857, 40.7484]])
    out = transform_ring(ring, 4326, 3857)
    # canonical spherical-mercator values (epsg.io): (10E, 50N)
    assert out[0, 0] == pytest.approx(1113194.9079327357, rel=1e-12)
    assert out[0, 1] == pytest.approx(6446275.841017158, rel=1e-12)
    assert out[1, 0] == 0.0 and out[1, 1] == pytest.approx(0.0, abs=1e-9)
    # NYC: definitionally x = R·radians(lon); y via the tan half-angle
    import math

    assert out[2, 0] == pytest.approx(
        6378137.0 * math.radians(-73.9857), rel=1e-15
    )
    assert out[2, 1] == pytest.approx(
        6378137.0 * math.log(math.tan(math.pi / 4 + math.radians(40.7484) / 2)),
        rel=1e-15,
    )
    back = transform_ring(out, 3857, 4326)
    assert np.allclose(back, ring, atol=1e-9)
    with pytest.raises(ValueError, match="unsupported"):
        transform_ring(ring, 4326, 25832)


def test_mercator_columns_match_numpy(spark):
    from open_energy_data_server_spark.functions.geo import (
        mercator_lonlat,
        mercator_xy,
        transform_ring,
    )

    df = spark.createDataFrame(
        [(10.0, 50.0), (-73.9857, 40.7484), (0.0, 0.0)], "lon double, lat double"
    )
    x, y = mercator_xy("lon", "lat")
    got = df.select(x.alias("x"), y.alias("y"))
    lon2, lat2 = mercator_lonlat("x", "y")
    rt = got.select(lon2.alias("lon"), lat2.alias("lat")).collect()
    for r, (lon, lat) in zip(rt, [(10.0, 50.0), (-73.9857, 40.7484), (0.0, 0.0)]):
        assert r["lon"] == pytest.approx(lon, abs=1e-9)
        assert r["lat"] == pytest.approx(lat, abs=1e-9)
    xy = got.collect()
    want = transform_ring(
        np.array([[10.0, 50.0], [-73.9857, 40.7484], [0.0, 0.0]]), 4326, 3857
    )
    for r, (wx, wy) in zip(xy, want):
        assert r["x"] == pytest.approx(wx, rel=1e-12)
        # JVM vs numpy libm tan/log differ in the last ulp (abs floor
        # covers lat=0, where the exact result is 0)
        assert r["y"] == pytest.approx(wy, rel=1e-9, abs=1e-6)


def test_simplify_ring_hand_computed():
    """Douglas-Peucker: the notch vertex at perpendicular distance
    0.01 survives tol=0.001 and dies at tol=0.1; corners always stay."""
    from open_energy_data_server_spark.functions.geo import (
        simplify_ring,
        st_simplify_wkt,
    )

    ring = np.array(
        [[0, 0], [5, 0.01], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float
    )
    fine = simplify_ring(ring, 0.001)
    assert fine.shape == (6, 2)
    coarse = simplify_ring(ring, 0.1)
    assert coarse.tolist() == [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]

    wkt = "POLYGON ((0 0, 5 0.01, 10 0, 10 10, 0 10, 0 0))"
    assert (
        st_simplify_wkt(wkt, 0.1)
        == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    )


def test_simplify_drops_collapsed_hole_keeps_outer():
    from open_energy_data_server_spark.functions.geo import st_simplify_wkt

    wkt = (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
        "(4 4, 4.01 4, 4.01 4.01, 4 4.01, 4 4))"
    )
    out = st_simplify_wkt(wkt, 0.1)
    assert out == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    # sub-tolerance detail on the outer ring never deletes the ring
    tiny = "POLYGON ((0 0, 0.001 0.0005, 0.002 0, 0.001 0.001, 0 0))"
    assert out.startswith("POLYGON ((")
    assert st_simplify_wkt(tiny, 5.0).startswith("POLYGON ((0 0")


def test_simplify_wkt_col_distributed(spark):
    from open_energy_data_server_spark.functions.geo import simplify_wkt_col

    df = spark.createDataFrame(
        [
            (1, "POLYGON ((0 0, 5 0.01, 10 0, 10 10, 0 10, 0 0))"),
            (2, None),
        ],
        "pid int, wkt string",
    )
    got = {
        r["pid"]: r["s"]
        for r in df.select("pid", simplify_wkt_col("wkt", 0.1).alias("s")).collect()
    }
    assert got[1] == "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    assert got[2] is None


def test_hull_from_geometry_table_full_pipeline(spark):
    """metadata_sql_helpers.sql:101-124 replica: simplify → points →
    concave hull → transform 3857→4326. Two unit squares (in mercator
    meters) around (10E,50N) and (11E,50N): every simplified vertex
    must fall inside/on the returned 4326 hull."""
    from open_energy_data_server_spark.functions.geo import (
        hull_from_geometry_table,
        parse_wkt_polygon,
        points_in_polygon,
        transform_ring,
    )

    def square(cx, cy, r=20000.0, notch=True):
        pts = [
            (cx - r, cy - r),
            ((cx,), (cy - r + 5.0,))[0][0] if notch else (cx),
            (cx + r, cy - r),
            (cx + r, cy + r),
            (cx - r, cy + r),
            (cx - r, cy - r),
        ]
        pts[1] = (cx, cy - r + 5.0)  # 5 m notch: dies at tol 20
        return "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in pts) + "))"

    base = transform_ring(np.array([[10.0, 50.0], [11.0, 50.0]]), 4326, 3857)
    df = spark.createDataFrame(
        [(square(*base[0]),), (square(*base[1]),)], "wkt string"
    )
    hull = hull_from_geometry_table(
        df, "wkt", simplify_tolerance=20.0, src_epsg=3857, dst_epsg=4326
    )
    ring = parse_wkt_polygon(hull)[0]
    # hull is in lon/lat: roughly the 10-11E, ~49.9-50.1N box
    assert 9.5 < ring[:, 0].min() < 10.0 and 11.0 < ring[:, 0].max() < 11.5
    # all 8 simplified corners (transformed to 4326) are covered
    for cx, cy in base:
        # inset 1% toward the centre: exact corners ARE hull vertices
        # and ray-cast is ambiguous on the boundary itself
        corners_3857 = np.array(
            [
                [cx - 19800, cy - 19800],
                [cx + 19800, cy - 19800],
                [cx + 19800, cy + 19800],
                [cx - 19800, cy + 19800],
                [cx, cy],
            ]
        )
        c = transform_ring(corners_3857, 3857, 4326)
        inside = points_in_polygon([ring], c[:, 0], c[:, 1])
        assert bool(inside.all())


def test_st_asgeojson_sql_matches_column_function(spark):
    """The SQL-registered ST_AsGeoJSON (session.register_engine_functions,
    serving the open_nrw.json dashboards) must stay in sync with the
    column function wkt_polygon_to_geojson (G1)."""
    from open_energy_data_server_spark.functions.geo import wkt_polygon_to_geojson
    from open_energy_data_server_spark.session import register_engine_functions
    from pyspark.sql import functions as F

    register_engine_functions(spark)
    wkts = [
        "POLYGON ((1 2, 3 4, 5 2, 1 2))",
        "POLYGON((6.1 50.7,6.2 50.7,6.2 50.8,6.1 50.7))",
    ]
    df = spark.createDataFrame([(w,) for w in wkts], "wkt string")
    both = df.select(
        wkt_polygon_to_geojson("wkt").alias("col_fn"),
        F.expr("ST_AsGeoJSON(wkt)").alias("sql_fn"),
    ).collect()
    for r in both:
        assert r.col_fn == r.sql_fn
        assert r.col_fn.startswith('{"type":"Polygon","coordinates":[[[')
