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
import pandas as pd
from pyspark.sql import DataFrame

from open_energy_data_server_spark.functions.geo import (
    parse_wkt_polygon,
    points_in_polygon,
    polygon_bbox,
)


def spatial_join_point_in_polygon(
    points: DataFrame,
    polygons: DataFrame,
    lon_col: str,
    lat_col: str,
    poly_id_col: str,
    wkt_col: str,
    out_col: str = "poly_id",
) -> DataFrame:
    """Left join: each point gets the id of the FIRST polygon (in
    ``poly_id_col`` ascending order) containing it, else null —
    deterministic when polygons overlap."""
    poly_rows = (
        polygons.select(poly_id_col, wkt_col).orderBy(poly_id_col).collect()
    )
    compiled = []
    for r in poly_rows:
        rings = parse_wkt_polygon(r[wkt_col])
        compiled.append((r[poly_id_col], polygon_bbox(rings), rings))

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
    return polygons.sparkSession.createDataFrame(
        out, f"cell_x int, cell_y int, {poly_id_col} {polygons.schema[poly_id_col].dataType.simpleString()}"
    )


def centroids(polygons: DataFrame, poly_id_col: str, wkt_col: str) -> DataFrame:
    """(id, centroid_lon, centroid_lat) via shoelace (G3)."""
    from open_energy_data_server_spark.functions.geo import polygon_centroid

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cents = [polygon_centroid(parse_wkt_polygon(w)) for w in pdf[wkt_col]]
            yield pd.DataFrame(
                {
                    poly_id_col: pdf[poly_id_col],
                    "centroid_lon": [c[0] for c in cents],
                    "centroid_lat": [c[1] for c in cents],
                }
            )

    id_t = polygons.schema[poly_id_col].dataType.simpleString()
    return polygons.select(poly_id_col, wkt_col).mapInPandas(
        compute, f"{poly_id_col} {id_t}, centroid_lon double, centroid_lat double"
    )
