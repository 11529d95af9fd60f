"""Geospatial + windowed-aggregation conformance queries.

Geometry queries synthesize deterministic points from ``events`` and
use literal WKT polygons chosen so no data point falls within 1e-2 of
any edge (grid coords are multiples of 0.1/0.5; polygon bounds sit at
x.x5/x.25 offsets) — the ray-cast result is then float-safe against
the oracle's closed-form inclusion tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.functions.geo import wkt_polygon_to_geojson
from open_energy_data_server_spark.io import load_table, local_df
from open_energy_data_server_spark.operators.spatial import (
    centroids,
    spatial_join_point_in_polygon,
)
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
    sql_ts_str,
    ts_str,
)
from open_energy_data_server_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
)

# poly 1 (triangle) overlaps poly 3 (east rect); first-match by id
POLYGONS: list[tuple[int, str]] = [
    (1, "POLYGON ((5.05 -20.25, 15.05 -20.25, 10.05 10.25, 5.05 -20.25))"),
    (2, "POLYGON ((-20.05 -30.25, -0.05 -30.25, -0.05 30.25, -20.05 30.25, -20.05 -30.25))"),
    (3, "POLYGON ((-0.05 -30.25, 19.85 -30.25, 19.85 30.25, -0.05 30.25, -0.05 -30.25))"),
]

_SQL_POINTS = """
  pts AS (
    SELECT event_id,
           (event_id % 400) / 10.0 - 20.0 AS lon,
           (user_id % 120) / 2.0 - 30.0 AS lat
    FROM events
  )"""

# half-plane tests for the triangle (CCW vertices; strict inequality —
# no data on edges by construction)
_T = ((5.05, -20.25), (15.05, -20.25), (10.05, 10.25))
_SQL_IN_TRI = " AND ".join(
    f"(({x2} - {x1}) * (lat - {y1}) - ({y2} - {y1}) * (lon - {x1})) > 0"
    for (x1, y1), (x2, y2) in zip(_T, _T[1:] + _T[:1])
)


def _polygons_df(spark: SparkSession) -> DataFrame:
    return local_df(spark, POLYGONS, "pid int, wkt string")


def _points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        ((F.col("event_id") % 400) / 10.0 - 20.0).alias("lon"),
        ((F.col("user_id") % 120) / 2.0 - 30.0).alias("lat"),
    )


@query(
    "q_point_in_polygon",
    oracle=f"""
    WITH {_SQL_POINTS}
    SELECT event_id, lon, lat,
           CASE WHEN {_SQL_IN_TRI} THEN 1
                WHEN lon > -20.05 AND lon < -0.05 AND lat > -30.25 AND lat < 30.25 THEN 2
                WHEN lon > -0.05 AND lon < 19.85 AND lat > -30.25 AND lat < 30.25 THEN 3
                ELSE NULL END AS poly_id
    FROM pts
    """,
)
def q_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: broadcast point-in-polygon left join (ray-cast pandas UDF
    with bbox prefilter) — the ecmwf/dwd grid→NUTS assignment. The
    oracle states the same regions as closed-form inequalities."""
    return spatial_join_point_in_polygon(
        _points_df(spark, sf_dir),
        _polygons_df(spark),
        lon_col="lon",
        lat_col="lat",
        poly_id_col="pid",
        wkt_col="wkt",
        out_col="poly_id",
    )


@query(
    "q_weather_shape_rollup",
    oracle=f"""
    WITH {_SQL_POINTS},
    assigned AS (
      SELECT e.event_id, e.value, p.lon, p.lat,
             CASE WHEN {_SQL_IN_TRI} THEN 1
                  WHEN lon > -20.05 AND lon < -0.05 AND lat > -30.25 AND lat < 30.25 THEN 2
                  WHEN lon > -0.05 AND lon < 19.85 AND lat > -30.25 AND lat < 30.25 THEN 3
                  ELSE NULL END AS poly_id
      FROM pts p JOIN events e USING (event_id)
    )
    SELECT poly_id, COUNT(*) AS n, {sql_davg("value")} AS avg_value
    FROM assigned GROUP BY poly_id
    """,
)
def q_weather_shape_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4+A1: the full weather-ingest shape — assign points to
    polygons, then groupBy(region).avg (ecmwf.py:206: per-NUTS mean of
    grid cells). Spatial tag is map-only; one agg shuffle follows."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    tagged = spatial_join_point_in_polygon(
        _points_df(spark, sf_dir),
        _polygons_df(spark),
        lon_col="lon",
        lat_col="lat",
        poly_id_col="pid",
        wkt_col="wkt",
        out_col="poly_id",
    )
    return (
        tagged.join(ev, "event_id")
        .groupBy("poly_id")
        .agg(F.count(F.lit(1)).alias("n"), davg("value").alias("avg_value"))
    )


@query(
    "q_polygon_centroids",
    oracle="""
    SELECT pid, ROUND(cx, 9) AS centroid_lon, ROUND(cy, 9) AS centroid_lat
    FROM (VALUES
      (1, (5.05 + 15.05 + 10.05) / 3.0, (-20.25 + -20.25 + 10.25) / 3.0),
      (2, (-20.05 + -0.05) / 2.0, (-30.25 + 30.25) / 2.0),
      (3, (-0.05 + 19.85) / 2.0, (-30.25 + 30.25) / 2.0)
    ) AS t(pid, cx, cy)
    """,
)
def q_polygon_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: shoelace centroids of the WKT polygons (rounded to 9
    decimals — the oracle states the closed forms: vertex mean for the
    triangle, bbox midpoint for rectangles; shoelace reduces to these
    exactly up to float rounding)."""
    cents = centroids(_polygons_df(spark), "pid", "wkt")
    return cents.select(
        "pid",
        F.round("centroid_lon", 9).alias("centroid_lon"),
        F.round("centroid_lat", 9).alias("centroid_lat"),
    )


@query(
    "q_wkt_to_geojson",
    oracle=r"""
    SELECT pid,
           '{"type":"Polygon","coordinates":[[' ||
           array_to_string(
             list_transform(
               string_split_regex(
                 regexp_replace(regexp_replace(wkt, '^POLYGON\s*\(\(', ''), '\)\)\s*$', ''),
                 ',\s*'),
               p -> '[' || regexp_replace(trim(p), '\s+', ',', 'g') || ']'),
             ',') || ']]}' AS geojson
    FROM (VALUES
      (1, 'POLYGON ((5.05 -20.25, 15.05 -20.25, 10.05 10.25, 5.05 -20.25))'),
      (2, 'POLYGON ((-20.05 -30.25, -0.05 -30.25, -0.05 30.25, -20.05 30.25, -20.05 -30.25))'),
      (3, 'POLYGON ((-0.05 -30.25, 19.85 -30.25, 19.85 30.25, -0.05 30.25, -0.05 -30.25))')
    ) AS t(pid, wkt)
    """,
)
def q_wkt_to_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: ST_AsGeoJSON as pure string expressions (no numeric round
    trip → no float-format divergence; codegen, no UDF)."""
    return _polygons_df(spark).select("pid", wkt_polygon_to_geojson("wkt").alias("geojson"))


@query(
    "q_tumbling_window_6h",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '6 hours', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           strftime(time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours',
                    '%Y-%m-%d %H:%M:%S') AS window_end,
           event_type, COUNT(*) AS n, {sql_dsum("value")} AS total
    FROM events GROUP BY 1, 2, 3
    """,
)
def q_tumbling_window_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window agg via the streaming builder in batch mode —
    identical lineage runs under readStream (tests/test_streaming)."""
    ev = load_table(spark, sf_dir, "events")
    out = tumbling_agg(
        ev,
        "ts",
        "6 hours",
        keys=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n"), dsum("value").alias("total")],
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n",
        "total",
    )


@query(
    "q_sliding_window_1h30m",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '30 minutes', ts) - k.k * INTERVAL '30 minutes',
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n
    FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
    GROUP BY 1
    """,
)
def q_sliding_window_1h30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h width / 30m slide): every event lands in
    exactly 2 windows; the oracle enumerates both bucket offsets."""
    ev = load_table(spark, sf_dir, "events")
    out = sliding_agg(ev, "ts", "1 hour", "30 minutes", aggs=[F.count(F.lit(1)).alias("n")])
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"), "n"
    )


@query(
    "q_session_windows",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL '5 minutes'
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id,
           {sql_ts_str("MIN(ts)")} AS session_start,
           {sql_ts_str("MAX(ts) + INTERVAL '5 minutes'")} AS session_end,
           COUNT(*) AS n, {sql_dsum("value")} AS total
    FROM sessions GROUP BY user_id, sid
    """,
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute gap) per user — the oracle is the
    classic gaps-and-islands rewrite (lag + cumulative break sum),
    proving session_window's merge semantics relationally."""
    ev = load_table(spark, sf_dir, "events")
    out = session_agg(
        ev,
        "ts",
        "5 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n"), dsum("value").alias("total")],
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n",
        "total",
    )


@query(
    "q_stream_stream_join",
    oracle=f"""
    SELECT l.event_id, l.user_id, {sql_ts_str('l.ts')} AS ts_s, l.value,
           r.event_id AS tick_id, {sql_ts_str('r.ts')} AS pts_s,
           r.value AS tick_value
    FROM events l JOIN events r
      ON l.user_id IS NOT DISTINCT FROM r.user_id
     AND r.ts >= l.ts - INTERVAL '30 minutes'
     AND r.ts <= l.ts + INTERVAL '30 minutes'
    WHERE l.event_id % 10 = 0 AND r.event_id % 10 = 5
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 depth: the watermarked stream-stream interval join run in
    batch mode (streaming.joins.stream_stream_join — the identical
    lineage runs under readStream in tests/test_streaming with
    state bounded by watermark + interval width). Two disjoint event
    slices stand in for the meter/price streams; the oracle is the
    plain interval equi-join."""
    from open_energy_data_server_spark.streaming.joins import stream_stream_join

    ev = load_table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_id") % 10 == 0).select("event_id", "ts", "user_id", "value")
    right = ev.filter(F.col("event_id") % 10 == 5).select(
        F.col("event_id").alias("tick_id"),
        F.col("ts").alias("pts"),
        "user_id",
        F.col("value").alias("tick_value"),
    )
    out = stream_stream_join(
        left, right, ["user_id"], "ts", "pts",
        "10 minutes", "10 minutes", "30 minutes", "30 minutes",
    )
    return out.select(
        "event_id", "user_id", ts_str("ts").alias("ts_s"), "value",
        "tick_id", ts_str("pts").alias("pts_s"), "tick_value",
    )


# 12-station reference grid for the nearest-station assignment (all
# coordinates exactly representable in binary so literal parsing is
# engine-independent)
STATIONS: list[tuple[int, float, float]] = [
    (i + 1, float(sx), float(sy))
    for i, (sx, sy) in enumerate(
        (sx, sy) for sx in (-15.0, -5.0, 5.0, 15.0) for sy in (-20.0, 0.0, 20.0)
    )
]

_SQL_STATIONS = "st(sid, sx, sy) AS (VALUES " + ", ".join(
    f"({sid}, {sx}, {sy})" for sid, sx, sy in STATIONS
) + ")"


@query(
    "q_nearest_station",
    oracle=f"""
    WITH {_SQL_POINTS},
    {_SQL_STATIONS},
    d AS (
      SELECT p.event_id, p.lon, p.lat, st.sid,
             ((p.lon - st.sx) * (p.lon - st.sx))
               + ((p.lat - st.sy) * (p.lat - st.sy)) AS d2
      FROM pts p CROSS JOIN st
    )
    SELECT event_id, lon, lat, CAST(sid AS INTEGER) AS station_id, d2
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_id ORDER BY d2, sid) AS rn
      FROM d
    ) WHERE rn = 1
    """,
)
def q_nearest_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-station assignment (operators/spatial.py
    nearest_point_join): every point mapped to the closest of 12
    plan-embedded reference sites by squared euclidean distance, ties
    to the lowest id — the measurement→weather-station mapping of the
    reference's station-keyed weather joins, as a zero-shuffle
    scan-speed projection (the 2-D analog of the IVF centroid
    assignment). The oracle replays the argmin from a VALUES table."""
    from open_energy_data_server_spark.operators.spatial import nearest_point_join

    pts = _points_df(spark, sf_dir)
    return nearest_point_join(pts, "lon", "lat", STATIONS)


@query(
    "q_polygon_area",
    oracle=r"""
    WITH polys AS (
      SELECT * FROM (VALUES
        (1, 'POLYGON ((5.05 -20.25, 15.05 -20.25, 10.05 10.25, 5.05 -20.25))'),
        (2, 'POLYGON ((-20.05 -30.25, -0.05 -30.25, -0.05 30.25, -20.05 30.25, -20.05 -30.25))'),
        (3, 'POLYGON ((-0.05 -30.25, 19.85 -30.25, 19.85 30.25, -0.05 30.25, -0.05 -30.25))')
      ) AS t(pid, wkt)
    ),
    pts AS (
      SELECT pid,
             list_transform(
               string_split_regex(regexp_extract(wkt, '\(\(([^)]*)\)', 1), ',\s*'),
               p -> string_split_regex(trim(p), '\s+')) AS ps
      FROM polys
    ),
    terms AS (
      SELECT pid,
             CAST(ROUND((CAST(ps[i+1][1] AS DOUBLE) * CAST(ps[i+2][2] AS DOUBLE)
                       - CAST(ps[i+2][1] AS DOUBLE) * CAST(ps[i+1][2] AS DOUBLE))
                        * 1000000.0, 0) AS BIGINT) AS t
      FROM pts, LATERAL (SELECT unnest(range(len(ps) - 1)) AS i)
    )
    SELECT pid, (CAST(ABS(CAST(SUM(t) AS BIGINT)) AS DOUBLE) / 1000000.0) / 2.0 AS area
    FROM terms GROUP BY pid
    """,
)
def q_polygon_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shoelace polygon area (the G-family companion to centroids —
    the reference's heat-density GDB layers carry per-polygon areas).
    Fixed-point cross-product terms make the per-ring sum an exact
    integer, so the Spark fold (sequential, zero-shuffle) and the
    oracle's order-free SUM agree bit-for-bit
    (operators.spatial.polygon_areas)."""
    from open_energy_data_server_spark.operators.spatial import polygon_areas

    return polygon_areas(_polygons_df(spark), "pid", "wkt")
