"""Pure-Python GRIB2 codec tests.

The fixture encoder below is test-side and independent of the decoder
(it lays out octets straight from the WMO spec tables), so the test
verifies the decoder against the public format, not against itself.
Expected values are hand-computed from the simple-packing formula
``value = (R + X·2^E) / 10^D``.
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from open_energy_data_server_spark.sources.grib2codec import decode_grib2


def _sm(v: int, nbytes: int) -> bytes:
    """GRIB2 sign-magnitude int encoding."""
    if v < 0:
        return ((1 << (8 * nbytes - 1)) | (-v)).to_bytes(nbytes, "big")
    return v.to_bytes(nbytes, "big")


def _pack_values(xs: list[int], nbits: int) -> bytes:
    bitstr = "".join(format(x, f"0{nbits}b") for x in xs)
    bitstr += "0" * (-len(bitstr) % 8)
    return bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))


def make_grib2(
    xs: list[int],
    ni: int,
    nj: int,
    lat1: float = 54.0,
    lon1: float = 6.0,
    dlat: float = 0.5,
    dlon: float = 0.25,
    r_ref: float = 250.0,
    e_scale: int = 1,
    d_scale: int = 1,
    nbits: int = 8,
    discipline: int = 0,
    category: int = 0,
    number: int = 0,
    ref_time=(2024, 1, 2, 3, 0, 0),
    forecast_hours: int = 5,
    bitmap: list[int] | None = None,
    scan: int = 0x00,
    drs_template: int = 0,
    data_override: bytes | None = None,
    sec5_extra: bytes = b"",
) -> bytes:
    n_data = len(xs)
    sec1 = (
        b"\x01"  # section number
        + (0).to_bytes(2, "big") * 2  # centre, subcentre
        + bytes([2, 0, 1])  # master/local tables, sig of ref time
        + ref_time[0].to_bytes(2, "big")
        + bytes(ref_time[1:])
        + bytes([0, 1])  # production status, type of data
    )
    sec1 = (len(sec1) + 4).to_bytes(4, "big") + sec1

    tmpl30 = (
        bytes([6])  # shape of earth
        + b"\x00" * 5  # radius scale factor + scaled value
        + b"\x00" * 5  # major axis
        + b"\x00" * 5  # minor axis
        + ni.to_bytes(4, "big")
        + nj.to_bytes(4, "big")
        + b"\x00" * 8  # basic angle + subdivisions
        + _sm(round(lat1 * 1e6), 4)
        + round(lon1 * 1e6).to_bytes(4, "big")
        + bytes([48])  # resolution/component flags
        + _sm(round((lat1 - dlat * (nj - 1)) * 1e6), 4)  # La2
        + round((lon1 + dlon * (ni - 1)) * 1e6).to_bytes(4, "big")  # Lo2
        + round(dlon * 1e6).to_bytes(4, "big")  # Di
        + round(dlat * 1e6).to_bytes(4, "big")  # Dj
        + bytes([scan])
    )
    sec3 = (
        b"\x03"
        + bytes([0])  # source of grid definition
        + (ni * nj).to_bytes(4, "big")
        + bytes([0, 0])  # optional-list octets, interpretation
        + (0).to_bytes(2, "big")  # template 3.0
        + tmpl30
    )
    sec3 = (len(sec3) + 4).to_bytes(4, "big") + sec3

    sec4 = (
        b"\x04"
        + (0).to_bytes(2, "big")  # NV
        + (0).to_bytes(2, "big")  # template 4.0
        + bytes([category, number, 2, 0, 0])
        + (0).to_bytes(2, "big")  # cutoff hours
        + bytes([0, 1])  # cutoff minutes, time unit = hour
        + forecast_hours.to_bytes(4, "big")
        + bytes([1, 0]) + (0).to_bytes(4, "big")  # first fixed surface
        + bytes([255, 0]) + (0).to_bytes(4, "big")  # second fixed surface
    )
    sec4 = (len(sec4) + 4).to_bytes(4, "big") + sec4

    sec5 = (
        b"\x05"
        + n_data.to_bytes(4, "big")
        + drs_template.to_bytes(2, "big")  # 5.0 simple / 5.41 PNG
        + struct.pack(">f", r_ref)
        + _sm(e_scale, 2)
        + _sm(d_scale, 2)
        + bytes([nbits, 0])
        + sec5_extra
    )
    sec5 = (len(sec5) + 4).to_bytes(4, "big") + sec5

    if bitmap is None:
        sec6 = b"\x06" + bytes([255])
    else:
        bits = "".join(str(b) for b in bitmap)
        bits += "0" * (-len(bits) % 8)
        sec6 = (
            b"\x06"
            + bytes([0])
            + bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
        )
    sec6 = (len(sec6) + 4).to_bytes(4, "big") + sec6

    sec7 = b"\x07" + (
        data_override if data_override is not None else _pack_values(xs, nbits)
    )
    sec7 = (len(sec7) + 4).to_bytes(4, "big") + sec7

    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    sec0 = b"GRIB" + b"\x00\x00" + bytes([discipline, 2]) + total.to_bytes(8, "big")
    return sec0 + body + b"7777"


def test_simple_packing_grid_decode():
    raw = make_grib2([0, 1, 2, 3, 4, 5], ni=3, nj=2)
    out = decode_grib2(raw).sort_values(["latitude", "longitude"]).reset_index(drop=True)
    assert len(out) == 6
    # (250 + X·2¹)/10¹ over a −j-scanned 3×2 grid: first row lat 54.0
    assert list(out["variable"].unique()) == ["t"]
    assert str(out["time"].iloc[0]) == "2024-01-02 08:00:00"  # ref 03:00 + 5 h
    expect = {
        (53.5, 6.00): 25.6,
        (53.5, 6.25): 25.8,
        (53.5, 6.50): 26.0,
        (54.0, 6.00): 25.0,
        (54.0, 6.25): 25.2,
        (54.0, 6.50): 25.4,
    }
    got = {
        (round(r.latitude, 6), round(r.longitude, 6)): round(r.value, 6)
        for r in out.itertuples()
    }
    assert got == expect


def test_negative_scale_factors_and_wide_fields():
    # 12-bit fields crossing byte boundaries; E=−1 → ×0.5, D=0
    raw = make_grib2(
        [100, 2000, 4095], ni=3, nj=1, r_ref=0.0, e_scale=-1, d_scale=0, nbits=12
    )
    out = decode_grib2(raw).sort_values("longitude")
    assert np.allclose(out["value"].to_numpy(), [50.0, 1000.0, 2047.5])


def test_bitmap_yields_nan_at_masked_points():
    raw = make_grib2(
        [10, 20, 30, 40, 50], ni=3, nj=2, bitmap=[1, 1, 0, 1, 1, 1],
        r_ref=0.0, e_scale=0, d_scale=0,
    )
    out = decode_grib2(raw).sort_values(["latitude", "longitude"]).reset_index(drop=True)
    assert len(out) == 6
    masked = out[(out.latitude == 54.0) & (np.isclose(out.longitude, 6.5))]
    assert math.isnan(masked["value"].iloc[0])
    assert np.nansum(out["value"]) == 10 + 20 + 30 + 40 + 50


def test_multi_message_file_and_param_fallback():
    m1 = make_grib2([0, 2], ni=2, nj=1, r_ref=0.0, e_scale=0, d_scale=0)
    m2 = make_grib2(
        [4, 6], ni=2, nj=1, r_ref=0.0, e_scale=0, d_scale=0,
        discipline=9, category=9, number=9,
    )
    out = decode_grib2(m1 + b"\x00padding\x00" + m2)
    assert sorted(out["variable"].unique()) == ["d9c9n9", "t"]
    assert sorted(out["value"]) == [0.0, 2.0, 4.0, 6.0]


def test_unsupported_packing_raises():
    raw = bytearray(make_grib2([1], ni=1, nj=1))
    # flip the section-5 template number (octets 10-11 of section 5) to
    # 50 (spectral packing — outside the supported set; 5.40 JPEG2000
    # became a pure codec in round 8)
    off = 16
    while True:
        ln = int.from_bytes(raw[off : off + 4], "big")
        if raw[off + 4] == 5:
            raw[off + 9 : off + 11] = (50).to_bytes(2, "big")
            break
        off += ln
    with pytest.raises(ValueError, match="5.50 unsupported"):
        decode_grib2(bytes(raw))


def test_spark_read_grib_distributed(spark, tmp_path):
    """binaryFile → mapInPandas with the real codec: two files, four
    messages, decoded executor-side into one long table."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.sources.grib import read_grib

    d = tmp_path / "grib"
    d.mkdir()
    (d / "a.grib2").write_bytes(make_grib2([0, 1, 2, 3, 4, 5], ni=3, nj=2))
    (d / "b.grib2").write_bytes(
        make_grib2([10, 11], ni=2, nj=1, r_ref=0.0, e_scale=0, d_scale=0,
                   category=2, number=2)
    )
    df = read_grib(spark, str(d))
    assert df.count() == 8
    by_var = {r["variable"]: r["n"] for r in df.groupBy("variable").agg(F.count("*").alias("n")).collect()}
    assert by_var == {"t": 6, "u": 2}
    umax = df.filter(F.col("variable") == "u").agg(F.max("value")).collect()[0][0]
    assert umax == 11.0


def test_grib2_roundtrip_property():
    """Property: for random packing parameters (bit width 1–24, scale
    factors −3..3, reference values, grid dims), decode reproduces
    value = (R + X·2^E)/10^D at every grid point."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        ni=st.integers(1, 6),
        nj=st.integers(1, 5),
        nbits=st.integers(1, 24),
        e_scale=st.integers(-3, 3),
        d_scale=st.integers(-3, 3),
        r_ref=st.floats(-1e4, 1e4, allow_nan=False, width=32),
        data=st.data(),
    )
    def check(ni, nj, nbits, e_scale, d_scale, r_ref, data):
        n = ni * nj
        xs = data.draw(
            st.lists(st.integers(0, 2**nbits - 1), min_size=n, max_size=n)
        )
        raw = make_grib2(
            xs, ni=ni, nj=nj, r_ref=r_ref, e_scale=e_scale, d_scale=d_scale,
            nbits=nbits,
        )
        out = decode_grib2(raw)
        assert len(out) == n
        want = sorted((struct.unpack(">f", struct.pack(">f", r_ref))[0]
                       + x * 2.0**e_scale) / 10.0**d_scale for x in xs)
        got = sorted(out["value"])
        assert np.allclose(got, want, rtol=1e-12, atol=1e-12)

    check()


def test_weather_pipeline_end_to_end(spark, tmp_path):
    """The reference's headline DWD pipeline, entirely in-engine:
    GRIB2 grids (pure-Python codec) → shapefile regions (pure-Python
    .shp reader) → point-in-polygon tagging → time_bucket rollup per
    region (/root/reference/crawler/dwd.py + ecmwf.py:195-206 do this
    via pygrib + PostGIS)."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.operators.spatial import (
        spatial_join_point_in_polygon,
    )
    from open_energy_data_server_spark.session import register_engine_functions
    from open_energy_data_server_spark.sources.grib import read_grib
    from open_energy_data_server_spark.sources.shapefile import read_shapefile
    from tests.test_shapefile import _poly_content, _shp

    register_engine_functions(spark)
    # two hourly 3×2 grids over lon 6..6.5, lat 53.5..54
    d = tmp_path / "grib"
    d.mkdir()
    (d / "h0.grib2").write_bytes(
        make_grib2([0, 1, 2, 3, 4, 5], ni=3, nj=2, ref_time=(2024, 1, 2, 3, 0, 0))
    )
    (d / "h1.grib2").write_bytes(
        make_grib2([10, 11, 12, 13, 14, 15], ni=3, nj=2, ref_time=(2024, 1, 2, 4, 0, 0))
    )
    grid = read_grib(spark, str(d))

    # two region polygons: west of 6.2 / east of 6.2 (CW rings)
    west = [(5.9, 53.4), (5.9, 54.1), (6.2, 54.1), (6.2, 53.4), (5.9, 53.4)]
    east = [(6.2, 53.4), (6.2, 54.1), (6.6, 54.1), (6.6, 53.4), (6.2, 53.4)]
    shp = tmp_path / "regions.shp"
    shp.write_bytes(_shp([_poly_content([west]), _poly_content([east])], 5))
    regions = read_shapefile(spark, str(shp)).select(
        F.col("record").alias("region_id"), "geometry"
    )

    tagged = spatial_join_point_in_polygon(
        grid, regions, lon_col="longitude", lat_col="latitude",
        poly_id_col="region_id", wkt_col="geometry", out_col="region_id",
    )
    tagged.createOrReplaceTempView("weather")
    rollup = spark.sql(
        """
        SELECT region_id, time_bucket(3600, time) AS hour,
               COUNT(*) AS n, AVG(value) AS mean_v
        FROM weather WHERE region_id IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).collect()
    got = {(r.region_id, str(r.hour)): (r.n, round(r.mean_v, 6)) for r in rollup}
    # lon 6.0 in west region; 6.25, 6.5 east. values row-major from lat 54.
    assert got[(1, "2024-01-02 08:00:00")] == (2, round((25.0 + 25.6) / 2, 6))
    assert got[(2, "2024-01-02 08:00:00")] == (4, round((25.2 + 25.4 + 25.8 + 26.0) / 4, 6))
    assert got[(1, "2024-01-02 09:00:00")] == (2, round((27.0 + 27.6) / 2, 6))


def test_zero_length_section_raises_not_hangs():
    raw = bytearray(make_grib2([1], ni=1, nj=1))
    raw[16:20] = (0).to_bytes(4, "big")  # zero out section-1 length
    with pytest.raises(ValueError, match="corrupt message"):
        decode_grib2(bytes(raw))
