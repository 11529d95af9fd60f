"""Broadcast point-in-polygon spatial join (SURVEY J4).

The reference's semantics exactly: ``gpd.sjoin(points, polygons,
predicate='within', how='left')`` (/root/reference/crawler/ecmwf.py:195-199)
and the brute-force ``geom.contains(point)`` grid loops
(/root/reference/crawler/dwd.py:46-59,183-194 — parallelized there
with mp.Pool; Spark's task parallelism replaces the pool).

Shape: polygons are a *small* dimension (NUTS3 ≈ 1,500 rows) —
collect to the driver once, broadcast, and test each point batch in
an Arrow-vectorized pandas iterator (mapInPandas). Per batch:
1. bbox prefilter (vectorized numpy compare) — O(|polys|) cheap masks,
2. exact even-odd ray cast only on bbox survivors.

At 100 TB of points this is a map-only pass (no shuffle at all); the
reference precomputes a grid→NUTS matrix for the same reason
(/root/reference/crawler/data/generate_plz_matrix.py:23-40) — the
equivalent here is persisting this join's output keyed by the grid
cell, which is exactly what the ecmwf/dwd ingest does.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pandas only appears in worker-side annotations;
    import pandas as pd  # eager import costs ~2 s of session init
from pyspark.sql import DataFrame

from open_energy_data_server_spark.functions.geo import (
    parse_wkt_polygon,
    points_in_polygon,
    polygon_bbox,
)


def _ray_cast_expr(ring, x, y):
    """JVM twin of ``functions.geo._ray_cast`` for one compiled ring:
    the edges are plan literals, so the even-odd test unrolls into a
    plain boolean expression (crossing tests XOR-chained via ``!=``).
    Horizontal edges never cross and are dropped at build time (the
    numpy twin relies on the same ``crosses`` mask to ignore its
    div-by-zero). Term order matches the numpy arithmetic exactly."""
    from pyspark.sql import functions as F

    inside = F.lit(False)
    for (xa, ya), (xb, yb) in zip(ring[:-1], ring[1:]):
        xa, ya, xb, yb = float(xa), float(ya), float(xb), float(yb)
        if ya == yb:
            continue
        crosses = (F.lit(ya) > y) != (F.lit(yb) > y)
        xint = F.lit(xa) + (y - F.lit(ya)) * F.lit(xb - xa) / F.lit(yb - ya)
        inside = inside != (crosses & (x < xint))
    return inside


def _contains_expr(rings, bbox, x, y):
    """bbox prefilter AND even-odd inclusion (outer ring minus holes)."""
    from pyspark.sql import functions as F

    x0, y0, x1, y1 = bbox
    hit = (
        (x >= F.lit(x0)) & (x <= F.lit(x1)) & (y >= F.lit(y0)) & (y <= F.lit(y1))
    ) & _ray_cast_expr(rings[0], x, y)
    for hole in rings[1:]:
        hit = hit & ~_ray_cast_expr(hole, x, y)
    return hit


def spatial_join_point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    lon_col: str,
    lat_col: str,
    poly_id_col: str,
    wkt_col: str,
    out_col: str = "poly_id",
    max_unroll_edges: int = 512,
) -> DataFrame:
    """Left join: each point gets the id of the FIRST polygon (in
    ``poly_id_col`` ascending order) containing it, else null —
    deterministic when polygons overlap.

    Two physical strategies, same semantics:
    - small compiled polygon sets (≤ ``max_unroll_edges`` total edges
      — dashboards, NUTS subsets): the ray casts unroll into literal
      boolean expressions chained with ``when`` in id order. Pure
      whole-stage-codegen projection, NO Python worker — a 100 TB
      point table tags at scan speed.
    - large sets: broadcast + Arrow-batched pandas ray cast (numpy
      twin of the same arithmetic), still map-only / shuffle-free.
    """
    poly_rows = (
        polygons.select(poly_id_col, wkt_col).orderBy(poly_id_col).collect()
    )
    compiled = []
    for r in poly_rows:
        rings = parse_wkt_polygon(r[wkt_col])
        compiled.append((r[poly_id_col], polygon_bbox(rings), rings))

    total_edges = sum(len(ring) - 1 for _, _, rings in compiled for ring in rings)
    if total_edges <= max_unroll_edges:
        from pyspark.sql import functions as F

        x, y = F.col(lon_col).cast("double"), F.col(lat_col).cast("double")
        assigned = F.lit(None).cast(polygons.schema[poly_id_col].dataType.simpleString())
        # reversed fold so the FIRST (lowest-id) containing polygon wins
        for pid, bbox, rings in reversed(compiled):
            assigned = F.when(_contains_expr(rings, bbox, x, y), F.lit(pid)).otherwise(
                assigned
            )
        return points.withColumn(out_col, assigned)

    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(compiled)
    # build a fresh StructType — StructType.add mutates the DataFrame's
    # cached schema object in place
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(points.schema.fields)
        + [T.StructField(out_col, polygons.schema[poly_id_col].dataType, True)]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        polys = bc.value
        for pdf in batches:
            x = pdf[lon_col].to_numpy(dtype=np.float64)
            y = pdf[lat_col].to_numpy(dtype=np.float64)
            result = np.full(len(pdf), None, dtype=object)
            unassigned = np.ones(len(pdf), dtype=bool)
            for pid, (x0, y0, x1, y1), rings in polys:
                if not unassigned.any():
                    break
                cand = unassigned & (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
                if not cand.any():
                    continue
                hit = np.zeros(len(pdf), dtype=bool)
                hit[cand] = points_in_polygon(rings, x[cand], y[cand])
                result[hit] = pid
                unassigned &= ~hit
            out = pdf.copy()
            out[out_col] = result
            yield out

    return points.mapInPandas(assign, out_schema)


def polygon_grid_index(
    polygons: DataFrame, poly_id_col: str, wkt_col: str, cell: float
) -> DataFrame:
    """(cell_x, cell_y, poly_id) coverage index at ``cell`` degrees —
    the scale path: pre-join points to candidate polygons on their
    grid cell (an equi-join) before the exact test, so the broadcast
    list per point is O(1). Cells come from the polygon bbox."""
    rows = polygons.select(poly_id_col, wkt_col).collect()
    out = []
    for r in rows:
        x0, y0, x1, y1 = polygon_bbox(parse_wkt_polygon(r[wkt_col]))
        for cx in range(int(np.floor(x0 / cell)), int(np.floor(x1 / cell)) + 1):
            for cy in range(int(np.floor(y0 / cell)), int(np.floor(y1 / cell)) + 1):
                out.append((cx, cy, r[poly_id_col]))
    from open_energy_data_server_spark.io import local_df

    return local_df(
        polygons.sparkSession,
        out,
        f"cell_x int, cell_y int, {poly_id_col} {polygons.schema[poly_id_col].dataType.simpleString()}",
    )


def _parsed_rings(polygons: DataFrame, poly_id_col: str, wkt_col: str) -> DataFrame:
    """Shared malformed-input-tolerant WKT outer-ring parse for the
    shoelace operators: string-tuple split first, a ≥2-vertex filter,
    try_cast to double, then a drop of any ring containing an
    unparseable or non-2D vertex. Junk rows are DROPPED, never a
    query-killing ANSI cast error — at 100 TB one bad row must not
    fail a 12-hour job (and the SQL twins' per-term unnest likewise
    yields no rows for the degenerate shapes). The explode(array(...))
    wrap is the generator barrier so downstream folds don't re-parse
    the WKT per reference."""
    from pyspark.sql import functions as F

    ring_txt = F.regexp_extract(F.col(wkt_col), r"\(\(([^)]*)\)", 1)
    coords_txt = F.transform(
        F.split(ring_txt, r",\s*"), lambda p: F.split(F.trim(p), r"\s+")
    )
    return (
        polygons.select(
            poly_id_col, F.explode(F.array(coords_txt)).alias("__ringtxt")
        )
        .filter(F.size(F.col("__ringtxt")) >= 2)
        .select(
            poly_id_col,
            F.transform(
                F.col("__ringtxt"),
                lambda pt: F.transform(pt, lambda t: t.try_cast("double")),
            ).alias("__ring"),
        )
        .filter(
            ~F.exists(
                F.col("__ring"),
                lambda pt: (F.size(pt) != 2)
                | pt[0].isNull()
                | pt[F.least(F.size(pt) - 1, F.lit(1))].isNull(),
            )
        )
    )


def centroids(polygons: DataFrame, poly_id_col: str, wkt_col: str) -> DataFrame:
    """(id, centroid_lon, centroid_lat) via shoelace (G3).

    Pure JVM expressions — WKT outer-ring parse (regexp + split) into
    an array<array<double>>, then the shoelace sums as zip_with /
    aggregate folds over consecutive vertex pairs. Same math,
    term-for-term, as ``functions.geo.polygon_centroid`` (the pandas
    twin used by the driver-side hull helpers); degenerate (zero-area)
    rings fall back to the vertex mean, also matching. Malformed /
    <2-vertex rows drop in ``_parsed_rings``. No Python worker in the
    plan — centroids of a 100 TB polygon table run at scan speed."""
    from pyspark.sql import functions as F

    parsed = _parsed_rings(polygons, poly_id_col, wkt_col)
    ring = F.col("__ring")
    m = F.size(ring)
    a = F.slice(ring, 1, m - 1)  # ring[:-1]
    b = F.slice(ring, 2, m - 1)  # ring[1:]
    cross = lambda u, v: u[0] * v[1] - v[0] * u[1]  # noqa: E731
    area2 = F.aggregate(F.zip_with(a, b, cross), F.lit(0.0), lambda acc, x: acc + x)
    cx_sum = F.aggregate(
        F.zip_with(a, b, lambda u, v: (u[0] + v[0]) * cross(u, v)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cy_sum = F.aggregate(
        F.zip_with(a, b, lambda u, v: (u[1] + v[1]) * cross(u, v)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    mean = lambda i: (  # noqa: E731
        F.aggregate(a, F.lit(0.0), lambda acc, u: acc + u[i]) / (m - 1)
    )
    cx = F.when(area2 != 0.0, cx_sum / (3.0 * area2)).otherwise(mean(0))
    cy = F.when(area2 != 0.0, cy_sum / (3.0 * area2)).otherwise(mean(1))
    return parsed.select(
        poly_id_col, cx.alias("centroid_lon"), cy.alias("centroid_lat")
    )


def polygon_areas(polygons: DataFrame, poly_id_col: str, wkt_col: str) -> DataFrame:
    """(id, area) — shoelace area of each WKT polygon's outer ring.

    Same zero-shuffle JVM parse as :func:`centroids`; the cross-product
    terms are fixed-pointed (6 decimals) before the per-ring fold so
    the sum is an exact integer — reassociation-free, hence replayable
    by an order-free SQL twin (see q_polygon_area). Per-row projection
    only: areas of a 100 TB polygon table run at scan speed.
    Malformed / <2-vertex rows drop in ``_parsed_rings``."""
    from pyspark.sql import functions as F

    parsed = _parsed_rings(polygons, poly_id_col, wkt_col)
    ring = F.col("__ring")
    m = F.size(ring)
    a = F.slice(ring, 1, m - 1)
    b = F.slice(ring, 2, m - 1)
    terms = F.zip_with(
        a,
        b,
        lambda u, v: F.round((u[0] * v[1] - v[0] * u[1]) * F.lit(1e6), 0).cast(
            "bigint"
        ),
    )
    s = F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    area = (F.abs(s).cast("double") / F.lit(1e6)) / F.lit(2.0)
    return parsed.select(poly_id_col, area.alias("area"))


def nearest_point_join(
    points: DataFrame,
    x_col: str,
    y_col: str,
    stations: list[tuple[int, float, float]],
    id_out: str = "station_id",
    dist_out: str = "d2",
) -> DataFrame:
    """Nearest-station assignment: each point gets the id of the
    closest reference site by squared euclidean distance, ties to the
    lowest id — the measurement→weather-station mapping the reference
    performs when joining DWD station data onto plant locations
    (/root/reference/crawler/, station-keyed weather tables).

    The station table is bounded driver metadata (like the polygon
    sets), so it is plan-embedded and the assignment is a ZERO-SHUFFLE
    scan-speed projection, the 2-D analog of the IVF centroid
    assignment. For continent-scale station sets, pre-bucket both
    sides on a coarse grid (``polygon_grid_index`` pattern) and embed
    per-bucket station subsets.

    Argmin form: ``least`` over the |stations| distance expressions
    plus a first-match CASE in ascending-sid order — plain codegen
    expressions, NOT an array_sort over (d², id) structs (array_sort
    is a CodegenFallback higher-order function: interpreted per
    element, with |stations| struct allocations per row — measured 4×
    this form on the sf0.1 scan). Semantics are identical by
    construction: ``least`` returns the exact minimum (it is one of
    the operands bit-for-bit), the CASE scans sids ascending so an
    exact tie resolves to the lowest id, and a NULL coordinate (all
    d² NULL → least NULL → no branch matches) falls through to the
    lowest sid with NULL d², byte-for-byte the struct-sort result.

    Distances are plain-double exact: (dx·dx)+(dy·dy) is the same
    IEEE op sequence in any engine, so an oracle replays the argmin
    bit-for-bit. Production haversine belongs in a wrapper; for
    argmin at sub-continental extents the euclidean ranking matches.
    """
    if not stations:
        raise ValueError("nearest_point_join needs at least one station")
    if len({int(s[0]) for s in stations}) != len(stations):
        # d2_by_sid is keyed by id — a duplicate would silently keep
        # only the last coordinate (the old struct-sort form kept both
        # and picked the nearer one); make the uniqueness invariant
        # explicit instead of changing behavior silently
        raise ValueError("nearest_point_join: duplicate station ids")
    if len(stations) > 256:
        # each CASE branch embeds the full least(...) over all
        # |stations| distances: O(|stations|²) expression nodes in the
        # unresolved plan (deduped at runtime by subexpression
        # elimination, but analysis/codegen cost grows quadratically).
        # The docstring's pre-bucketing pattern is the scale path.
        raise ValueError(
            "nearest_point_join: station list too large for the "
            "plan-embedded argmin (O(n²) expression nodes); pre-bucket "
            "on a coarse grid and embed per-bucket subsets"
        )
    from pyspark.sql import functions as F

    d2_by_sid: dict[int, "F.Column"] = {}
    for sid, sx, sy in sorted(stations, key=lambda s: int(s[0])):
        dx = F.col(x_col) - F.lit(float(sx))
        dy = F.col(y_col) - F.lit(float(sy))
        d2_by_sid[int(sid)] = (dx * dx) + (dy * dy)
    d2s = list(d2_by_sid.values())
    best = F.least(*d2s) if len(d2s) > 1 else d2s[0]
    sids = list(d2_by_sid)
    case = F.when(d2_by_sid[sids[0]] == best, F.lit(sids[0]))
    for sid in sids[1:]:
        case = case.when(d2_by_sid[sid] == best, F.lit(sid))
    case = case.otherwise(F.lit(sids[0]))
    return points.select(
        "*",
        case.alias(id_out),
        best.alias(dist_out),
    )
