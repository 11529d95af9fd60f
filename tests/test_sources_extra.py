"""Tests for the remaining source formats (sqlite, XML, GRIB
plumbing, Excel gate) and the interpolation/hull operators."""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest
from pyspark.sql import functions as F

from open_energy_data_server_spark.functions.geo import convex_hull_wkt, parse_wkt_polygon
from open_energy_data_server_spark.operators.interpolate import (
    interpolate_cubic,
    interpolate_linear,
)
from open_energy_data_server_spark.sources.excel import HAS_OPENPYXL, read_excel
from open_energy_data_server_spark.sources.grib import read_grib
from open_energy_data_server_spark.sources.sqlite import list_tables, read_sqlite_table
from open_energy_data_server_spark.sources.xml_source import read_xml, read_xml_files


def test_sqlite_roundtrip(spark, tmp_path):
    db = str(tmp_path / "opsd.sqlite")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE household (id INTEGER, ts TEXT, kwh REAL)")
        con.executemany(
            "INSERT INTO household VALUES (?, ?, ?)",
            [(1, "2024-01-01", 1.5), (2, "2024-01-02", 2.5)],
        )
    assert list_tables(db) == ["household"]
    df = read_sqlite_table(spark, db, "household")
    assert df.columns == ["id", "ts", "kwh"]
    assert df.agg(F.sum("kwh")).collect()[0][0] == 4.0


OPEC_XML = """<?xml version="1.0"?>
<prices>
  <item date="2024-01-02"><value>78.5</value></item>
  <item date="2024-01-03"><value>79.25</value></item>
</prices>
"""


def test_xml_driver_side(spark, tmp_path):
    p = tmp_path / "opec.xml"
    p.write_text(OPEC_XML)
    df = read_xml(spark, str(p), "item", {"date": "@date", "usd": "value"})
    rows = {r.date: r.usd for r in df.collect()}
    assert rows == {"2024-01-02": "78.5", "2024-01-03": "79.25"}


def test_xml_distributed(spark, tmp_path):
    d = tmp_path / "xmls"
    d.mkdir()
    for i in range(3):
        (d / f"f{i}.xml").write_text(
            f'<r><rec k="{i}"><v>{i * 10}</v></rec><rec k="x{i}"><v>{i}</v></rec></r>'
        )
    df = read_xml_files(spark, str(d), "rec", {"k": "@k", "v": "v"})
    assert df.count() == 6
    assert {r.v for r in df.filter(F.col("k") == "2").collect()} == {"20"}


def test_grib_default_codec_rejects_garbage_and_injected_decoder(spark, tmp_path):
    p = tmp_path / "g"
    p.mkdir()
    (p / "a.grib").write_bytes(b"\x01\x02\x03")
    with pytest.raises(Exception, match="no GRIB messages"):
        read_grib(spark, str(p)).collect()

    def fake(raw: bytes) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "time": [pd.Timestamp("2024-01-01")] * len(raw),
                "latitude": [50.0 + b for b in raw],
                "longitude": [6.0] * len(raw),
                "variable": ["temp_air"] * len(raw),
                "value": [273.15 + b for b in raw],
            }
        )

    out = read_grib(spark, str(p), decoder=fake)
    assert out.count() == 3
    assert out.agg(F.max("latitude")).collect()[0][0] == 53.0


def test_excel_xlsx_no_longer_gated(spark, tmp_path):
    """.xlsx reads via the pure-Python codec regardless of openpyxl
    (full coverage in test_xlsx.py); only legacy .xls stays gated."""
    from tests.test_xlsx import SHARED, SHEET1, make_xlsx

    p = tmp_path / "x.xlsx"
    p.write_bytes(make_xlsx({"Data": SHEET1}, SHARED))
    assert read_excel(spark, str(p)).count() == 2


def test_interpolate_linear_values(spark):
    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 10, None), ("a", 20, None), ("a", 40, 8.0),
         ("a", 50, None), ("b", 0, None), ("b", 10, 5.0)],
        "k string, x long, v double",
    )
    out = {
        (r.k, r.x): r.v
        for r in interpolate_linear(df, "v", "x", partition_by=["k"]).collect()
    }
    assert out[("a", 10)] == 2.0 and out[("a", 20)] == 4.0  # linear between 0→8 over 40
    assert out[("a", 50)] == 8.0  # trailing gap → previous
    assert out[("b", 0)] == 5.0  # leading gap → next


def test_interpolate_cubic_exact_on_cubic_poly(spark):
    """Not-a-knot splines reproduce cubic polynomials EXACTLY — the
    property that distinguishes scipy's interp1d(kind='cubic') boundary
    condition from a natural spline (which would disagree near the
    ends). Nulls of y = x³ − 2x² + 3 must come back to machine
    precision, including the trailing extrapolated point."""

    def poly(x):
        return x**3 - 2 * x**2 + 3

    xs = [0.0, 1.0, 2.5, 3.0, 4.5, 5.0, 6.0, 7.5]
    rows = [("a", x, poly(x) if i % 3 != 1 else None) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, "k string, x double, v double")
    out = {r.x: r.v for r in interpolate_cubic(df, "v", "x", ["k"]).collect()}
    for x in xs:
        assert abs(out[x] - poly(x)) < 1e-8, (x, out[x], poly(x))


def test_interpolate_cubic_small_series_falls_back_linear(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 0.0), ("a", 1.0, None), ("a", 2.0, 4.0)],
        "k string, x double, v double",
    )
    out = {r.x: r.v for r in interpolate_cubic(df, "v", "x", ["k"]).collect()}
    assert out[1.0] == 2.0  # positional linear fallback


def test_interpolate_cubic_duplicate_x_collapses_to_mean(spark):
    """Two events with identical x no longer abort the scipy-free
    spline (h<=0 ValueError): duplicates collapse to their mean before
    the fit, and a cubic through the collapsed knots still reproduces
    exactly. Rows 1.0→(3.0, 5.0) collapse to (1.0, 4.0) = x³+3 at 1."""

    def poly(x):
        return x**3 + 3

    rows = [("a", 1.0, 3.0), ("a", 1.0, 5.0)] + [
        ("a", x, poly(x)) for x in (0.0, 2.0, 3.0, 4.0, 5.0)
    ] + [("a", 2.5, None)]
    df = spark.createDataFrame(rows, "k string, x double, v double")
    out = {r.x: r.v for r in interpolate_cubic(df, "v", "x", ["k"]).collect()}
    assert abs(out[2.5] - poly(2.5)) < 1e-8
    assert abs(out[1.0] - 4.0) < 1e-8  # both duplicate rows get the fit value


def test_convex_hull():
    wkt = convex_hull_wkt([(0, 0), (4, 0), (4, 3), (0, 3), (2, 1), (1, 2)])
    rings = parse_wkt_polygon(wkt)
    # interior points excluded, ring closed
    assert rings[0].shape == (5, 2)
    assert set(map(tuple, rings[0][:-1])) == {(0, 0), (4, 0), (4, 3), (0, 3)}
    with pytest.raises(ValueError):
        convex_hull_wkt([(0, 0), (1, 1)])


def test_notaknot_spline_numpy_unit():
    """4 knots → the unique interpolating cubic; validation errors."""
    import numpy as np

    from open_energy_data_server_spark.operators.interpolate import (
        notaknot_spline_eval,
    )

    xk = np.array([0.0, 1.0, 2.0, 4.0])
    yk = 2 * xk**3 - xk + 1
    xe = np.array([-1.0, 0.5, 1.7, 3.3, 5.0])  # includes extrapolation
    got = notaknot_spline_eval(xk, yk, xe)
    want = 2 * xe**3 - xe + 1
    assert np.allclose(got, want, atol=1e-9)
    with pytest.raises(ValueError, match=">= 4 knots"):
        notaknot_spline_eval(xk[:3], yk[:3], xe)
    with pytest.raises(ValueError, match="strictly increasing"):
        notaknot_spline_eval(np.array([0.0, 1.0, 1.0, 2.0]), yk, xe)


def test_interpolate_cubic_fallback_is_x_ordered_and_fills_leading(spark):
    """<4 known points → linear-in-x (not positional): leading gaps
    flat-extend and results are independent of shuffle row order."""
    df = spark.createDataFrame(
        [("a", 2.0, 8.0), ("a", 0.0, None), ("a", 1.0, 4.0)],
        "k string, x double, v double",
    )
    out = {r.x: r.v for r in interpolate_cubic(df, "v", "x", ["k"]).collect()}
    assert out[0.0] == 4.0  # leading gap flat-extends to first known
    assert out[1.0] == 4.0 and out[2.0] == 8.0


def test_interpolate_cubic_pre_partitioned_equals_grouped(spark):
    """The round-11 pre-partitioned mapInPandas path must reproduce the
    grouped applyInPandas path bit-for-bit (same per-series fit
    function), and its plan must carry no Exchange."""
    from open_energy_data_server_spark.queries.scalars import cubic_input_df

    sparse = cubic_input_df(spark)
    fast = interpolate_cubic(
        sparse, "v", "x", ["series_id"], out_col="o",
        use_scipy=False, pre_partitioned=True,
    )
    slow = interpolate_cubic(
        sparse, "v", "x", ["series_id"], out_col="o", use_scipy=False,
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "pre-partitioned path gained a shuffle"
    got = {r.row_id: r.o for r in fast.collect()}
    want = {r.row_id: r.o for r in slow.collect()}
    assert got == want  # exact float equality, all 10k rows


def test_cubic_input_df_series_aligned_to_partitions(spark):
    """cubic_input_df's contract for pre_partitioned=True: every
    series lands wholly inside one range partition, and the row set is
    the documented bijection (row_id covers 0..n-1, series_id = row_id
    mod n_series)."""
    from open_energy_data_server_spark.queries.scalars import (
        CUBIC_N_POINTS,
        CUBIC_N_SERIES,
        cubic_input_df,
    )

    df = cubic_input_df(spark)
    per_part = (
        df.groupBy(F.spark_partition_id().alias("p"), "series_id")
        .count()
        .collect()
    )
    owners = {}
    for r in per_part:
        owners.setdefault(r.series_id, set()).add(r.p)
        assert r["count"] <= CUBIC_N_POINTS
    assert all(len(ps) == 1 for ps in owners.values()), "series split across partitions"
    ids = sorted(r.row_id for r in df.select("row_id").collect())
    assert ids == list(range(CUBIC_N_SERIES * CUBIC_N_POINTS))
