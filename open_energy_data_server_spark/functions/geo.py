"""Geospatial kit (SURVEY §2.8, G1–G4, J4).

The reference stores PostGIS geometries and does point-in-polygon
joins at ingest (/root/reference/crawler/ecmwf.py:195-199,
/root/reference/crawler/dwd.py:46-59) and GeoJSON rendering in
dashboards (open_nrw.json rawSql ``ST_AsGeoJSON``). This engine keeps
geometry as WKT string columns; the compute kit is dependency-free:

- WKT polygon parsing + ray-cast point-in-polygon + shoelace centroid
  in numpy (no shapely in the container; the algorithms are textbook),
- WKT→GeoJSON as pure string expressions (codegen, no UDF).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pandas is only needed by the one pandas-UDF below;
    import pandas as pd  # importing it eagerly costs ~2 s of session init

_WKT_POLY = re.compile(r"POLYGON\s*\(\s*(.+)\s*\)\s*$", re.IGNORECASE | re.DOTALL)


def parse_wkt_polygon(wkt: str) -> list[np.ndarray]:
    """'POLYGON ((x y, ...), (hole ...))' → [outer_ring, *holes],
    each an (n, 2) float array."""
    m = _WKT_POLY.match(wkt.strip())
    if not m:
        raise ValueError(f"not a WKT polygon: {wkt[:50]!r}")
    body = m.group(1)
    rings = []
    for ring_txt in re.findall(r"\(([^()]+)\)", body):
        pts = [
            [float(p) for p in pair.strip().split()[:2]]
            for pair in ring_txt.split(",")
            if pair.strip()
        ]
        rings.append(np.asarray(pts, dtype=np.float64))
    if not rings:
        raise ValueError(f"empty polygon: {wkt[:50]!r}")
    return rings


def _ray_cast(ring: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting: (n_points,) bool for one ring."""
    inside = np.zeros(x.shape, dtype=bool)
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    for xa, ya, xb, yb in zip(x1, y1, x2, y2):
        crosses = (ya > y) != (yb > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = xa + (y - ya) * (xb - xa) / (yb - ya)
        inside ^= crosses & (x < xint)
    return inside


def points_in_polygon(rings: list[np.ndarray], x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Even-odd inclusion over outer ring and holes."""
    result = _ray_cast(rings[0], x, y)
    for hole in rings[1:]:
        result &= ~_ray_cast(hole, x, y)
    return result


def polygon_bbox(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    outer = rings[0]
    return (
        float(outer[:, 0].min()),
        float(outer[:, 1].min()),
        float(outer[:, 0].max()),
        float(outer[:, 1].max()),
    )


def polygon_centroid(rings: list[np.ndarray]) -> tuple[float, float]:
    """Shoelace-weighted centroid of the outer ring
    (the nuts_mapper ``centroid.x/.y``, nuts_mapper.py:44-46)."""
    ring = rings[0]
    x, y = ring[:-1, 0], ring[:-1, 1]
    xn, yn = ring[1:, 0], ring[1:, 1]
    cross = x * yn - xn * y
    area = cross.sum() / 2.0
    if area == 0:
        return float(x.mean()), float(y.mean())
    cx = ((x + xn) * cross).sum() / (6.0 * area)
    cy = ((y + yn) * cross).sum() / (6.0 * area)
    return float(cx), float(cy)


def convex_hull_wkt(points: list[tuple[float, float]]) -> str:
    """Monotone-chain convex hull → WKT polygon (G2: the metadata
    footprint field; the reference uses ST_ConcaveHull on a sampled
    point set, metadata_sql_helpers.sql:86-124 — convex hull is the
    dependency-free stand-in, same bounded-size driver-side shape,
    swappable for a concave implementation)."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        raise ValueError("convex hull needs ≥3 distinct points")

    def half(seq):
        out: list[tuple[float, float]] = []
        for p in seq:
            while (
                len(out) >= 2
                and (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
                <= 0
            ):
                out.pop()
            out.append(p)
        return out

    lower, upper = half(pts), half(reversed(pts))
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        # monotone chain collapsed both halves to one segment: the
        # points are exactly collinear (any slope, not just axis-
        # aligned) — a 2-vertex "polygon" would be degenerate WKT
        raise ValueError("convex hull needs ≥3 non-collinear points")
    ring = hull + [lower[0]]
    body = ", ".join(f"{x} {y}" for x, y in ring)
    return f"POLYGON (({body}))"


def wkt_point(lon: Column | str, lat: Column | str) -> Column:
    """ST_MakePoint analog: 'POINT (lon lat)' WKT string."""
    lo = F.col(lon) if isinstance(lon, str) else lon
    la = F.col(lat) if isinstance(lat, str) else lat
    return F.concat(F.lit("POINT ("), lo.cast("string"), F.lit(" "), la.cast("string"), F.lit(")"))


def wkt_polygon_to_geojson(wkt: Column | str) -> Column:
    """ST_AsGeoJSON for single-ring WKT polygons as pure string ops
    (no numeric round trip → no float-formatting divergence):
    'POLYGON ((1 2, 3 4, 1 2))' →
    '{"type":"Polygon","coordinates":[[[1,2],[3,4],[1,2]]]}'."""
    c = F.col(wkt) if isinstance(wkt, str) else wkt
    inner = F.regexp_replace(c, r"^POLYGON\s*\(\(", "")
    inner = F.regexp_replace(inner, r"\)\)\s*$", "")
    pairs = F.transform(
        F.split(inner, r",\s*"),
        lambda p: F.concat(F.lit("["), F.regexp_replace(F.trim(p), r"\s+", ","), F.lit("]")),
    )
    return F.concat(
        F.lit('{"type":"Polygon","coordinates":[['),
        F.array_join(pairs, ","),
        F.lit("]]}"),
    )


def hull_from_table(
    df, lon_col: str, lat_col: str, max_sample: int = 10_000, concave: bool = True
) -> str:
    """Dataset footprint WKT for the metadata catalog (G2): bounded
    point sample → concave hull (kNN walk, convex fallback) — the
    reference's ST_ConcaveHull-over-sampled-points metadata sweep
    (metadata_sql_helpers.sql:86-124). Sample is a limit-scan, so the
    driver never sees more than ``max_sample`` coordinate pairs."""
    rows = (
        df.select(F.col(lon_col).cast("double"), F.col(lat_col).cast("double"))
        .dropna()
        .limit(max_sample)
        .collect()
    )
    pts = [(r[0], r[1]) for r in rows]
    return concave_hull_wkt(pts) if concave else convex_hull_wkt(pts)


def _segments_cross(p1, p2, p3, p4) -> bool:
    """Proper intersection of open segments p1p2 and p3p4 (shared
    endpoints don't count — consecutive hull edges always touch)."""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    if p2 == p3 or p1 == p4 or p1 == p3 or p2 == p4:
        return False
    return (
        orient(p1, p2, p3) != orient(p1, p2, p4)
        and orient(p3, p4, p1) != orient(p3, p4, p2)
        and orient(p1, p2, p3) != 0
    )


def concave_hull_wkt(points: list[tuple[float, float]], k: int = 3, max_k: int = 24) -> str:
    """k-nearest-neighbours concave hull (Moreira & Santos, GRAPP'07)
    → WKT polygon — the ST_ConcaveHull analog the reference's metadata
    sweep applies to a sampled point set
    (metadata_sql_helpers.sql:86-124). Walks the boundary choosing,
    among the k nearest unused points, the most clockwise turn that
    doesn't cross the hull; k grows on failure and the convex hull is
    the final fallback (ST_ConcaveHull's own degenerate limit)."""
    import math

    pts = sorted(set(points))
    if len(pts) < 3:
        raise ValueError("hull needs ≥3 distinct points")
    if len(pts) == 3:
        ring = pts + [pts[0]]
        return "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in ring) + "))"

    def walk(kk: int):
        start = min(pts, key=lambda p: (p[1], p[0]))
        hull = [start]
        current, prev_ang = start, math.pi  # first turn sweeps from 'left'
        used = {start}
        for _ in range(len(pts) * 2):
            if len(hull) >= 4 and current == start:
                return hull
            cands = sorted(
                (p for p in pts if p not in used or (p == start and len(hull) >= 3)),
                key=lambda p: (p[0] - current[0]) ** 2 + (p[1] - current[1]) ** 2,
            )[:kk]
            # most-clockwise turn relative to the incoming direction
            cands.sort(
                key=lambda p: (
                    prev_ang - math.atan2(p[1] - current[1], p[0] - current[0])
                ) % (2 * math.pi),
                reverse=True,
            )
            step = None
            for cand in cands:
                new_edge = (current, cand)
                last = 1 if cand == start else 0
                if not any(
                    _segments_cross(*new_edge, hull[i], hull[i + 1])
                    for i in range(len(hull) - 1 - last)
                ):
                    step = cand
                    break
            if step is None:
                return None
            hull.append(step)
            prev_ang = math.atan2(current[1] - step[1], current[0] - step[0])
            current = step
            used.add(step)
        return None

    arr = np.array(pts, dtype=np.float64)
    for kk in range(max(3, k), max_k + 1):
        hull = walk(kk)
        if hull is None:
            continue
        ring = np.array(hull, dtype=np.float64)
        inside = _ray_cast(ring, arr[:, 0], arr[:, 1])
        on_ring = np.array([tuple(p) in set(hull) for p in pts])
        if bool(np.all(inside | on_ring)):
            return "POLYGON ((" + ", ".join(f"{x} {y}" for x, y in hull) + "))"
    return convex_hull_wkt(points)


# --- CRS transform + simplification (G2 completion) -----------------
#
# The reference's metadata hull pipeline is
#   ST_Transform(ST_ConcaveHull(ST_Collect(ST_Points(
#       ST_Simplify(geometry, 20))), 0.5), 4326)
# (/root/reference/docs/source/examples/metadata_sql_helpers.sql:86-124,
# geometries stored in EPSG:3857 web-mercator meters, hull delivered in
# EPSG:4326 lon/lat). The two missing pieces — ST_Transform between
# those two CRSes and ST_Simplify — are implemented below, both as
# numpy ring math (driver-side, bounded metadata work) and as Spark
# Column / Arrow forms for distributed per-row use.

WEB_MERCATOR_R = 6378137.0  # WGS84 semi-major axis, EPSG:3857 sphere


def mercator_xy(lon: Column | str, lat: Column | str) -> tuple[Column, Column]:
    """EPSG:4326 lon/lat degrees → EPSG:3857 meters as built-in JVM
    expressions (whole-stage codegen; no UDF): the spherical-Mercator
    forward map x = R·λ, y = R·ln(tan(π/4 + φ/2))."""
    lo = F.col(lon) if isinstance(lon, str) else lon
    la = F.col(lat) if isinstance(lat, str) else lat
    x = F.radians(lo) * F.lit(WEB_MERCATOR_R)
    y = F.lit(WEB_MERCATOR_R) * F.log(
        F.tan(F.radians(la) / F.lit(2.0) + F.lit(float(np.pi / 4)))
    )
    return x, y


def mercator_lonlat(x: Column | str, y: Column | str) -> tuple[Column, Column]:
    """EPSG:3857 meters → EPSG:4326 degrees (inverse spherical
    Mercator), built-in expressions only."""
    xc = F.col(x) if isinstance(x, str) else x
    yc = F.col(y) if isinstance(y, str) else y
    lon = F.degrees(xc / F.lit(WEB_MERCATOR_R))
    lat = F.degrees(
        F.lit(2.0) * F.atan(F.exp(yc / F.lit(WEB_MERCATOR_R)))
        - F.lit(float(np.pi / 2))
    )
    return lon, lat


def transform_ring(ring: np.ndarray, src_epsg: int, dst_epsg: int) -> np.ndarray:
    """(n, 2) coordinate array between EPSG:4326 and EPSG:3857 (the
    pair the reference's pipeline uses). Identity when src == dst."""
    if src_epsg == dst_epsg:
        return ring
    if (src_epsg, dst_epsg) == (4326, 3857):
        x = np.radians(ring[:, 0]) * WEB_MERCATOR_R
        y = WEB_MERCATOR_R * np.log(np.tan(np.radians(ring[:, 1]) / 2 + np.pi / 4))
        return np.column_stack([x, y])
    if (src_epsg, dst_epsg) == (3857, 4326):
        lon = np.degrees(ring[:, 0] / WEB_MERCATOR_R)
        lat = np.degrees(2 * np.arctan(np.exp(ring[:, 1] / WEB_MERCATOR_R)) - np.pi / 2)
        return np.column_stack([lon, lat])
    raise ValueError(
        f"transform {src_epsg}→{dst_epsg} unsupported (4326↔3857 only; "
        "full PROJ pipelines need pyproj — inject upstream)"
    )


def st_transform_wkt(wkt: str, src_epsg: int, dst_epsg: int) -> str:
    """ST_Transform analog for WKT polygons (outer ring + holes)."""
    rings = [transform_ring(r, src_epsg, dst_epsg) for r in parse_wkt_polygon(wkt)]
    body = ", ".join(
        "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in r) + ")" for r in rings
    )
    return f"POLYGON ({body})"


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas-Peucker polyline simplification, iterative (explicit
    stack — no recursion limit on 100k-vertex cadastral rings). Keeps
    every point whose perpendicular distance from the local anchor
    segment exceeds ``tolerance``; endpoints always survive. A closed
    ring (first == last) keeps its closure."""
    pts = np.asarray(ring, dtype=np.float64)
    n = len(pts)
    if n <= 2:
        return pts
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        seg = pts[i1] - pts[i0]
        mid = pts[i0 + 1 : i1]
        L2 = float(seg @ seg)
        if L2 == 0.0:  # degenerate anchor (closed ring): radial distance
            d = np.hypot(mid[:, 0] - pts[i0, 0], mid[:, 1] - pts[i0, 1])
        else:
            # perpendicular distance to the INFINITE line through the
            # anchors, clamped to the segment (standard DP metric)
            t = np.clip(((mid - pts[i0]) @ seg) / L2, 0.0, 1.0)
            proj = pts[i0] + t[:, None] * seg
            d = np.hypot(mid[:, 0] - proj[:, 0], mid[:, 1] - proj[:, 1])
        j = int(np.argmax(d))
        if d[j] > tolerance:
            keep[i0 + 1 + j] = True
            stack.append((i0, i0 + 1 + j))
            stack.append((i0 + 1 + j, i1))
    return pts[keep]


def st_simplify_wkt(wkt: str, tolerance: float) -> str:
    """ST_Simplify analog for WKT polygons: Douglas-Peucker per ring.
    A ring simplified below 4 points (closed) collapses to its
    bounding segment's endpoints and is dropped if degenerate —
    matching ST_Simplify's collapse behavior for sub-tolerance holes.
    The outer ring is always emitted, but never as invalid WKT: if it
    collapses below the 4-point closed-ring minimum it is padded by
    repeating surviving vertices (PostGIS's preserveCollapsed shape),
    so downstream parsers always get a syntactically valid ring."""
    rings = parse_wkt_polygon(wkt)
    out: list[np.ndarray] = []
    for idx, r in enumerate(rings):
        s = simplify_ring(r, tolerance)
        if len(s) < 4:
            if idx > 0:
                continue  # hole collapsed
            # outer ring collapsed: pad to a degenerate-but-valid
            # closed 4-point ring instead of emitting e.g.
            # POLYGON ((x y, x y))
            pts = [p for p in s]
            while len(pts) < 4:
                pts.insert(1, pts[0])
            pts[-1] = pts[0]  # closure
            s = np.asarray(pts)
        out.append(s)
    body = ", ".join(
        "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in r) + ")" for r in out
    )
    return f"POLYGON ({body})"


def simplify_wkt_col(wkt: Column | str, tolerance: float) -> Column:
    """Distributed per-row ST_Simplify over a WKT column (Arrow-batched
    pandas UDF — geometry parsing is genuinely per-row Python; this is
    the same documented seam as the shapefile/GRIB decode)."""
    global pd
    import pandas as pd  # noqa: PLW0603 — lazy; must land in module
    # globals so pandas_udf's get_type_hints can resolve the annotation

    from pyspark.sql.functions import pandas_udf

    tol = float(tolerance)

    @pandas_udf("string")
    def _simp(s: pd.Series) -> pd.Series:
        return s.map(lambda w: None if w is None else st_simplify_wkt(w, tol))

    c = F.col(wkt) if isinstance(wkt, str) else wkt
    return _simp(c)


def hull_from_geometry_table(
    df,
    wkt_col: str,
    simplify_tolerance: float = 0.0,
    src_epsg: int = 4326,
    dst_epsg: int = 4326,
    max_sample: int = 10_000,
) -> str:
    """The reference's full geometry-column metadata hull
    (metadata_sql_helpers.sql:101-124): per-row ST_Simplify
    (distributed, Arrow-batched) → ST_Points explode (built-in
    regexp split — JVM-side) → bounded sample → ST_ConcaveHull →
    ST_Transform of the hull ring. Only the ≤``max_sample`` sampled
    vertices and the hull ring ever reach the driver."""
    simped = (
        df.select(simplify_wkt_col(wkt_col, simplify_tolerance).alias("w"))
        if simplify_tolerance > 0
        else df.select(F.col(wkt_col).alias("w"))
    )
    pts = (
        simped.dropna()
        .select(
            F.explode(
                F.split(F.regexp_replace("w", r"POLYGON|\(|\)", ""), r",\s*")
            ).alias("p")
        )
        .select(F.split(F.trim("p"), r"\s+").alias("xy"))
        .select(
            F.element_at("xy", 1).cast("double").alias("x"),
            F.element_at("xy", 2).cast("double").alias("y"),
        )
        .dropna()
        .limit(max_sample)
        .collect()
    )
    hull = concave_hull_wkt([(r["x"], r["y"]) for r in pts])
    return st_transform_wkt(hull, src_epsg, dst_epsg) if src_epsg != dst_epsg else hull
