"""Pure-Python GRIB edition-1 codec tests.

Like the GRIB2 suite, the fixture encoder below is test-side and lays
out octets straight from the WMO FM 92 Ed.1 spec (PDS/GDS/BMS/BDS
octet tables), so the decoder is verified against the public format,
not against itself. Expected values are hand-computed from
``value = (R + X·2^E) / 10^D`` with R an IBM hexadecimal float.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from open_energy_data_server_spark.sources.grib1codec import (
    _ibm_float,
    unrotate,
)
from open_energy_data_server_spark.sources.grib2codec import decode_grib2


def _ibm32(x: float) -> bytes:
    """Test-side IBM 360 float encoder (independent derivation)."""
    if x == 0:
        return b"\x00" * 4
    sign = 0x8000_0000 if x < 0 else 0
    x = abs(x)
    # exponent a with x/16^(a-64) in [1/16, 1)
    a = 64 + max(-64, min(63, int(math.ceil(math.log(x, 16)))))
    while x / 16.0 ** (a - 64) >= 1.0:
        a += 1
    while x / 16.0 ** (a - 64) < 1.0 / 16.0 and a > 0:
        a -= 1
    m = round(x * 2**24 / 16.0 ** (a - 64))
    return (sign | (a << 24) | m).to_bytes(4, "big")


def _sm2(v: int) -> bytes:
    return ((0x8000 | -v) if v < 0 else v).to_bytes(2, "big")


def _sm3(v: int) -> bytes:
    return ((0x80_0000 | -v) if v < 0 else v).to_bytes(3, "big")


def _pack(xs: list[int], nbits: int) -> bytes:
    bitstr = "".join(format(x, f"0{nbits}b") for x in xs)
    bitstr += "0" * (-len(bitstr) % 8)
    return bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))


def make_grib1(
    xs: list[int],
    ni: int,
    nj: int,
    la1: float = 54.0,
    lo1: float = 6.0,
    la2: float | None = None,
    lo2: float | None = None,
    dlat: float = 0.5,
    dlon: float = 0.25,
    r_ref: float = 250.0,
    e_scale: int = 1,
    d_scale: int = 1,
    nbits: int = 8,
    param: int = 11,
    ref_time=(1999, 1, 2, 3, 0),
    unit: int = 1,
    p1: int = 5,
    p2: int = 0,
    tri: int = 0,
    bitmap: list[int] | None = None,
    grid_type: int = 0,
    pole: tuple[float, float] = (-40.0, 10.0),
    bds_flags: int = 0x0,
    scan: int = 0x00,
    bds_body_override: bytes | None = None,
) -> bytes:
    """Spec-derived GRIB1 message encoder (octet numbers per WMO Ed.1)."""
    year = ref_time[0]
    century, yoc = divmod(year - 1, 100)
    century, yoc = century + 1, yoc + 1
    pds = (
        bytes([2, 78, 1, 255, (0x80 | (0x40 if bitmap is not None else 0))])
        + bytes([param, 1])  # parameter, level type (surface)
        + (0).to_bytes(2, "big")  # level
        + bytes([yoc, ref_time[1], ref_time[2], ref_time[3], ref_time[4]])
        + bytes([unit, p1, p2, tri])
        + (0).to_bytes(2, "big")  # number in average
        + bytes([0, century, 0])  # missing, century, subcentre
        + _sm2(d_scale)
    )
    pds = (len(pds) + 3).to_bytes(3, "big") + pds

    if la2 is None:
        la2 = la1 - dlat * (nj - 1)
    if lo2 is None:
        lo2 = lo1 + dlon * (ni - 1)
    gds_body = (
        bytes([0, 255, grid_type])
        + ni.to_bytes(2, "big")
        + nj.to_bytes(2, "big")
        + _sm3(round(la1 * 1e3))
        + _sm3(round(lo1 * 1e3))
        + bytes([0x80])  # resolution flags: increments given
        + _sm3(round(la2 * 1e3))
        + _sm3(round(lo2 * 1e3))
        + round(abs(dlon) * 1e3).to_bytes(2, "big")
        + round(abs(dlat) * 1e3).to_bytes(2, "big")
        + bytes([scan])
        + b"\x00" * 4  # reserved octets 29-32
    )
    if grid_type == 10:
        gds_body += (
            _sm3(round(pole[0] * 1e3))
            + _sm3(round(pole[1] * 1e3))
            + _ibm32(0.0)  # angle of rotation
        )
    gds = (len(gds_body) + 3).to_bytes(3, "big") + gds_body

    bms = b""
    if bitmap is not None:
        bits = "".join(str(b) for b in bitmap)
        unused = -len(bits) % 8
        bits += "0" * unused
        bm_bytes = bytes(
            int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
        )
        body = bytes([unused]) + (0).to_bytes(2, "big") + bm_bytes
        bms = (len(body) + 3).to_bytes(3, "big") + body

    if bds_body_override is not None:
        bds_body = bds_body_override
    else:
        data = _pack(xs, nbits)
        unused_bits = (8 * len(data)) - len(xs) * nbits
        bds_body = (
            bytes([(bds_flags << 4) | unused_bits])
            + _sm2(e_scale)
            + _ibm32(r_ref)
            + bytes([nbits])
            + data
        )
    if len(bds_body) % 2:  # BDS length must be even per spec
        bds_body += b"\x00"
        bds_body = bytes([bds_body[0] + 8]) + bds_body[1:]  # 8 more unused bits
    bds = (len(bds_body) + 3).to_bytes(3, "big") + bds_body

    total = 8 + len(pds) + len(gds) + len(bms) + len(bds) + 4
    return (
        b"GRIB" + total.to_bytes(3, "big") + bytes([1])
        + pds + gds + bms + bds + b"7777"
    )


def test_ibm_float_roundtrip():
    # hand-computed: 250.0 = 16384000 · 16^(66-64) / 2^24
    assert _ibm_float((66 << 24 | 16384000).to_bytes(4, "big")) == 250.0
    assert _ibm_float(b"\x00" * 4) == 0.0
    for x in (250.0, -1.5, 0.0625, 101325.0, 273.15):
        got = _ibm_float(_ibm32(x))
        assert got == pytest.approx(x, rel=1e-6), x


def test_grib1_simple_packing_values_and_grid():
    # 2x2 grid, X = [0, 10, 20, 35]: value = (250 + X·2^1) / 10^1
    raw = make_grib1([0, 10, 20, 35], ni=2, nj=2)
    df = decode_grib2(raw)
    assert list(df.columns) == [
        "time", "latitude", "longitude", "variable", "value",
    ]
    assert len(df) == 4
    assert df["variable"].unique().tolist() == ["t"]
    # ref 1999-01-02 03:00 + P1=5 hours
    assert str(df["time"].iloc[0]) == "1999-01-02 08:00:00"
    assert df["value"].tolist() == [25.0, 27.0, 29.0, 32.0]
    # -j scan: first row lat 54.0, second 53.5; i fastest
    assert df["latitude"].tolist() == [54.0, 54.0, 53.5, 53.5]
    assert df["longitude"].tolist() == [6.0, 6.25, 6.0, 6.25]


def test_grib1_bitmap_fills_nan():
    raw = make_grib1([7, 9], ni=2, nj=2, bitmap=[1, 0, 0, 1],
                     r_ref=0.0, e_scale=0, d_scale=0)
    df = decode_grib2(raw)
    vals = df["value"].tolist()
    assert vals[0] == 7.0 and vals[3] == 9.0
    assert np.isnan(vals[1]) and np.isnan(vals[2])


def test_grib1_rotated_grid_unrotates_to_true_coords():
    # COSMO-style pole: south pole of rotation at (-40, 10) → rotated
    # (0, 0) is true (50N, 10E) — the classic anchor point
    raw = make_grib1(
        [1], ni=1, nj=1, la1=0.0, lo1=0.0, grid_type=10,
        pole=(-40.0, 10.0), r_ref=0.0, e_scale=0, d_scale=0,
    )
    df = decode_grib2(raw)
    assert df["latitude"].iloc[0] == pytest.approx(50.0, abs=1e-9)
    assert df["longitude"].iloc[0] == pytest.approx(10.0, abs=1e-9)
    # rotated north pole (90 rotated lat) maps to the pole itself
    lat, lon = unrotate(np.array([90.0]), np.array([0.0]), -40.0, 10.0)
    assert lat[0] == pytest.approx(40.0) and lon[0] == pytest.approx(190.0)
    # independent derivation: rotation matrices. v' built in the
    # rotated frame, rotated back by Ry(-(90-phi_pole)) then Rz(lam_pole)
    rng = np.random.default_rng(7)
    for _ in range(25):
        phi_r = rng.uniform(-80, 80)
        lam_r = rng.uniform(-170, 170)
        lat_got, lon_got = unrotate(
            np.array([phi_r]), np.array([lam_r]), -40.0, 10.0
        )
        pr, lr = math.radians(phi_r), math.radians(lam_r)
        v = np.array(
            [math.cos(pr) * math.cos(lr), math.cos(pr) * math.sin(lr),
             math.sin(pr)]
        )
        # R = Rz(lon_sp) · Ry(−(90+lat_sp)): checked on the anchors —
        # x'=(1,0,0) → (50N,10E), z'=(0,0,1) → the pole (40N,190E)
        theta = math.radians(90.0 + (-40.0))
        ry = np.array(
            [[math.cos(theta), 0, -math.sin(theta)], [0, 1, 0],
             [math.sin(theta), 0, math.cos(theta)]]
        )
        lam_sp = math.radians(10.0)
        rz = np.array(
            [[math.cos(lam_sp), -math.sin(lam_sp), 0],
             [math.sin(lam_sp), math.cos(lam_sp), 0], [0, 0, 1]]
        )
        x, y, z = rz @ (ry @ v)
        want_lat = math.degrees(math.asin(max(-1.0, min(1.0, z))))
        want_lon = math.degrees(math.atan2(y, x)) % 360.0
        assert lat_got[0] == pytest.approx(want_lat, abs=1e-9)
        assert lon_got[0] == pytest.approx(want_lon, abs=1e-9)


def test_grib1_multi_message_and_mixed_edition():
    from tests.test_grib2codec import make_grib2

    m1 = make_grib1([0, 10, 20, 35], ni=2, nj=2)
    m2 = make_grib2([0, 10, 20, 35], ni=2, nj=2)
    df = decode_grib2(m1 + b"pad" + m2)
    assert len(df) == 8
    assert sorted(df["variable"].unique()) == ["t"]


def test_grib1_period_product_lead_time():
    # tri=4 (accumulation): valid at end of [P1, P2]
    raw = make_grib1([1], ni=1, nj=1, p1=0, p2=12, tri=4,
                     r_ref=0.0, e_scale=0, d_scale=0)
    df = decode_grib2(raw)
    assert str(df["time"].iloc[0]) == "1999-01-02 15:00:00"


def test_grib1_second_order_without_extended_flags_raises():
    # flag bit 2 set but bit 4 (extended flags at octet 14) clear is
    # not a layout the decoder can interpret — clean error, no garbage
    raw = make_grib1([1, 2], ni=2, nj=1, bds_flags=0x4,
                     r_ref=0.0, e_scale=0, d_scale=0)
    with pytest.raises(ValueError, match="extended flags"):
        decode_grib2(raw)


def test_grib1_distributed_read(spark, tmp_path):
    from open_energy_data_server_spark.sources.grib import read_grib

    raw = make_grib1([0, 10, 20, 35], ni=2, nj=2)
    for name in ("a.grb", "b.grb"):
        (tmp_path / name).write_bytes(raw)
    df = read_grib(spark, str(tmp_path / "*.grb"))
    rows = df.collect()
    assert len(rows) == 8
    assert {r["value"] for r in rows} == {25.0, 27.0, 29.0, 32.0}


def make_so_bds(
    fo: list[int],
    so: list[int],
    group_of: list[int],
    nbits_fo: int = 8,
    widths=4,
    sec_bitmap: bool = False,
    r_ref: float = 250.0,
    e_scale: int = 1,
    ext_extra: int = 0,
) -> bytes:
    """BDS body for GRIB1 grid-point second-order packing (WMO Ed.1
    octets 4..): flags 0x5 (grid, complex, float, extended flags),
    N1/N2 pointers, P1/P2 counts, width table at octet 22, optional
    secondary bitmap, FO data at N1, SO deviations at N2."""
    p1, p2 = len(fo), len(so)
    diff = isinstance(widths, (list, tuple))
    wlist = list(widths) if diff else [widths] * p1
    ext = (0x40 if sec_bitmap else 0) | (0x20 if diff else 0) | ext_extra
    width_bytes = bytes(wlist) if diff else bytes([wlist[0]])
    sb_bytes = b""
    if sec_bitmap:
        bits = "".join(
            "1" if (i == 0 or group_of[i] != group_of[i - 1]) else "0"
            for i in range(p2)
        )
        bits += "0" * (-len(bits) % 8)
        sb_bytes = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    fo_data = _pack(fo, nbits_fo)
    so_bits = "".join(
        format(v, f"0{wlist[group_of[i]]}b") for i, v in enumerate(so)
    )
    unused = -len(so_bits) % 8
    so_bits += "0" * unused
    so_data = bytes(int(so_bits[i : i + 8], 2) for i in range(0, len(so_bits), 8))
    n1 = 22 + len(width_bytes) + len(sb_bytes)
    n2 = n1 + len(fo_data)
    body = (
        bytes([(0x5 << 4) | unused])
        + _sm2(e_scale)
        + _ibm32(r_ref)
        + bytes([nbits_fo])
        + n1.to_bytes(2, "big")
        + bytes([ext])
        + n2.to_bytes(2, "big")
        + p1.to_bytes(2, "big")
        + p2.to_bytes(2, "big")
        + b"\x00"
        + width_bytes
        + sb_bytes
        + fo_data
        + so_data
    )
    return body


def test_grib1_second_order_row_by_row():
    # 2x2 grid, rows are groups: FO=[0,100], SO=[0,10,20,35], width 6
    # value = (250 + (FO+SO)·2^1) / 10^1
    body = make_so_bds([0, 100], [0, 10, 20, 35], [0, 0, 1, 1], widths=6)
    raw = make_grib1([], ni=2, nj=2, bds_body_override=body)
    df = decode_grib2(raw)
    assert df["value"].tolist() == [25.0, 27.0, 49.0, 52.0]


def test_grib1_second_order_secondary_bitmap_diff_widths():
    # irregular groups via secondary bitmap: [p0] [p1 p2 p3] [p4 p5],
    # per-group widths 3/6/4
    fo, so = [5, 0, 40], [1, 0, 33, 7, 2, 9]
    grp = [0, 1, 1, 1, 2, 2]
    body = make_so_bds(fo, so, grp, widths=[3, 6, 4], sec_bitmap=True)
    raw = make_grib1([], ni=3, nj=2, bds_body_override=body)
    df = decode_grib2(raw)
    x = [fo[g] + s for g, s in zip(grp, so)]
    assert df["value"].tolist() == [(250.0 + v * 2.0) / 10.0 for v in x]


def test_grib1_second_order_with_primary_bitmap():
    # 2x2 grid, point 2 missing; 3 present points in one group
    body = make_so_bds([10], [0, 5, 20], [0, 0, 0], widths=5)
    raw = make_grib1(
        [], ni=2, nj=2, bitmap=[1, 1, 0, 1], bds_body_override=body
    )
    df = decode_grib2(raw)
    vals = df["value"].tolist()
    assert vals[0] == 27.0 and vals[1] == 28.0 and vals[3] == 31.0
    assert vals[2] != vals[2]  # NaN


def test_grib1_second_order_matches_simple_packing():
    # property: one group with FO=0 and SO width = simple nbits is
    # bit-identical to simple packing of the same X field
    xs = [0, 3, 17, 255, 128, 64, 1, 200, 99]
    simple = decode_grib2(make_grib1(xs, ni=3, nj=3, nbits=8))
    body = make_so_bds([0], xs, [0] * len(xs), widths=8)
    so = decode_grib2(make_grib1([], ni=3, nj=3, bds_body_override=body))
    assert simple["value"].tolist() == so["value"].tolist()


def test_grib1_second_order_boustrophedonic():
    """Serpentine ordering: rows 1, 3, … are stored right-to-left and
    the decoder flips them back — identical values to the plain
    row-major message with those rows pre-reversed."""
    # 3x3 grid, one group, FO=0, SO width 8 → value = f(SO) directly
    serpentine = [1, 2, 3, 6, 5, 4, 7, 8, 9]  # row 1 stored reversed
    body = make_so_bds([0], serpentine, [0] * 9, widths=8, ext_extra=0x08)
    df = decode_grib2(make_grib1([], ni=3, nj=3, bds_body_override=body))
    expect = [(250.0 + v * 2.0) / 10.0 for v in [1, 2, 3, 4, 5, 6, 7, 8, 9]]
    assert df["value"].tolist() == expect
    # and the (lat, lon) pairing is the uniform i-fastest layout
    assert df["longitude"].tolist()[:3] == df["longitude"].tolist()[3:6]


def test_grib1_second_order_unsupported_variants_raise():
    body_m = make_so_bds([0], [1, 2, 3, 4], [0] * 4, ext_extra=0x80)
    with pytest.raises(ValueError, match="matrix"):
        decode_grib2(make_grib1([], ni=2, nj=2, bds_body_override=body_m))
    body_g = make_so_bds([0], [1, 2, 3, 4], [0] * 4, ext_extra=0x10)
    with pytest.raises(ValueError, match="general extended"):
        decode_grib2(make_grib1([], ni=2, nj=2, bds_body_override=body_g))
    # boustrophedonic IS supported on full rows, but not under a
    # primary bitmap (irregular row lengths)
    body_b = make_so_bds([10], [0, 5, 20], [0] * 3, widths=5, ext_extra=0x08)
    with pytest.raises(ValueError, match="boustrophedonic"):
        decode_grib2(
            make_grib1(
                [], ni=2, nj=2, bitmap=[1, 1, 0, 1], bds_body_override=body_b
            )
        )
    # row-by-row with P1 not dividing P2
    body_r = make_so_bds([0, 1, 2], [1, 2, 3, 4], [0, 0, 1, 2])
    with pytest.raises(ValueError, match="P1"):
        decode_grib2(make_grib1([], ni=2, nj=2, bds_body_override=body_r))


def test_grib1_general_extended_injection_example(spark, tmp_path):
    """The general-extended second-order variant (extended flag 0x10,
    the gribex/ECMWF layout with group-width/length tables and
    spatial differencing) stays at the documented injection seam: the
    pure decoder refuses it LOUDLY, and the same file decodes through
    ``read_grib(..., decoder=...)`` with a pygrib/cfgrib-style adapter
    — the exact wiring an operator would use
    (``sources/grib.py`` module docstring). The fake below stands in
    for ``pygrib.open(...)``/``cfgrib`` since native GRIB libs are
    not in this container; its output contract (long frame of
    time/lat/lon/variable/value) is the real adapter contract."""
    import pandas as pd

    from open_energy_data_server_spark.sources.grib import read_grib

    body = make_so_bds([0], [1, 2, 3, 4], [0] * 4, ext_extra=0x10)
    msg = make_grib1([], ni=2, nj=2, bds_body_override=body)
    d = tmp_path / "gx"
    d.mkdir()
    (d / "genext.grib").write_bytes(msg)

    # pure path: loud, cause-naming refusal (not a wrong decode)
    with pytest.raises(Exception, match="general extended"):
        read_grib(spark, str(d / "*.grib")).collect()

    # injected adapter: what `lambda raw: pygrib_frame(raw)` would
    # return for this 2x2 field
    expect = np.array([11.0, 12.0, 13.0, 14.0])

    def pygrib_like(raw: bytes) -> pd.DataFrame:
        assert raw[:4] == b"GRIB" and raw[7] == 1  # edition-1 message
        return pd.DataFrame(
            {
                "time": [pd.Timestamp("2020-07-01 03:00")] * 4,
                "latitude": [50.0, 50.0, 49.0, 49.0],
                "longitude": [6.0, 7.0, 6.0, 7.0],
                "variable": ["temp_air"] * 4,
                "value": expect,
            }
        )

    rows = read_grib(spark, str(d / "*.grib"), decoder=pygrib_like).collect()
    assert sorted(r.value for r in rows) == expect.tolist()
    assert all(r.variable == "temp_air" for r in rows)


# ---------------------------------------------------------------------------
# spherical harmonics (GDS representation type 50, simple packing)


def make_grib1_sh(
    real00: float,
    xs: list[int],
    trunc: int = 1,
    r_ref: float = 250.0,
    e_scale: int = 1,
    d_scale: int = 1,
    nbits: int = 8,
    param: int = 11,
    k: int | None = None,
    m: int | None = None,
    rep_type: int = 1,
    rep_mode: int = 1,
    bds_flags: int = 0x8,
) -> bytes:
    """GRIB1 message with a type-50 spherical-harmonic GDS and an SH
    simple-packed BDS (real(0,0) as IBM float ×10^D in octets 12-15,
    the rest packed from octet 16)."""
    pds = (
        bytes([2, 78, 1, 255, 0x80])
        + bytes([param, 1])
        + (0).to_bytes(2, "big")
        + bytes([99, 1, 2, 3, 0])
        + bytes([1, 5, 0, 0])
        + (0).to_bytes(2, "big")
        + bytes([0, 20, 0])
        + _sm2(d_scale)
    )
    pds = (len(pds) + 3).to_bytes(3, "big") + pds
    gds_body = (
        bytes([0, 255, 50])
        + trunc.to_bytes(2, "big")
        + (trunc if k is None else k).to_bytes(2, "big")
        + (trunc if m is None else m).to_bytes(2, "big")
        + bytes([rep_type, rep_mode])
        + b"\x00" * 18  # reserved octets 15-32
    )
    gds = (len(gds_body) + 3).to_bytes(3, "big") + gds_body
    data = _pack(xs, nbits)
    unused_bits = (8 * len(data)) - len(xs) * nbits
    bds_body = (
        bytes([(bds_flags << 4) | unused_bits])
        + _sm2(e_scale)
        + _ibm32(r_ref)
        + bytes([nbits])
        + _ibm32(real00 * (10.0**d_scale))
        + data
    )
    if len(bds_body) % 2:
        bds_body += b"\x00"
        bds_body = bytes([bds_body[0] + 8]) + bds_body[1:]
    bds = (len(bds_body) + 3).to_bytes(3, "big") + bds_body
    total = 8 + len(pds) + len(gds) + len(bds) + 4
    return (
        b"GRIB" + total.to_bytes(3, "big") + bytes([1])
        + pds + gds + bds + b"7777"
    )


def test_grib1_spherical_harmonic_simple_packing():
    # T1 triangular: coefficients (n,m) = (0,0),(1,0),(1,1) → 6 values
    # (re/im interleaved), real(0,0) carried as IBM float, the other
    # 5 packed: value = (250 + X·2^1)/10^1
    raw = make_grib1_sh(7.25, [0, 10, 20, 35, 50], trunc=1)
    df = decode_grib2(raw)
    assert len(df) == 6
    assert df["variable"].tolist() == ["t_sh_re", "t_sh_im"] * 3
    # geometry columns carry the (total, zonal) wavenumber pair in
    # IFS order: m slowest, n = m..T within each m
    assert df["latitude"].tolist() == [0.0, 0.0, 1.0, 1.0, 1.0, 1.0]
    assert df["longitude"].tolist() == [0.0, 0.0, 0.0, 0.0, 1.0, 1.0]
    assert df["value"].iloc[0] == pytest.approx(7.25)
    assert df["value"].iloc[1:].tolist() == [25.0, 27.0, 29.0, 32.0, 35.0]
    assert str(df["time"].iloc[0]) == "1999-01-02 08:00:00"


def test_grib1_spherical_harmonic_loud_errors():
    # pentagonal truncation → injection seam
    with pytest.raises(ValueError, match="pentagonal"):
        decode_grib2(make_grib1_sh(1.0, [0] * 5, trunc=1, m=2))
    # complex packing (representation mode 2) → injection seam
    with pytest.raises(ValueError, match="complex-packed"):
        decode_grib2(make_grib1_sh(1.0, [0] * 5, trunc=1, rep_mode=2))
    # complex packing signalled via BDS flag bit 2
    with pytest.raises(ValueError, match="complex-packed"):
        decode_grib2(make_grib1_sh(1.0, [0] * 5, trunc=1, bds_flags=0xC))
    # grid-point BDS under a spherical GDS → corrupt
    with pytest.raises(ValueError, match="grid-point BDS"):
        decode_grib2(make_grib1_sh(1.0, [0] * 5, trunc=1, bds_flags=0x0))
    # representation type must be associated Legendre (1)
    with pytest.raises(ValueError, match="representation type"):
        decode_grib2(make_grib1_sh(1.0, [0] * 5, trunc=1, rep_type=2))
    # truncated data section
    msg = make_grib1_sh(1.0, [0, 1, 2], trunc=1)
    with pytest.raises(ValueError, match="too short|short"):
        decode_grib2(msg)


def test_grib1_spherical_order_matches_grib2_spectral():
    """Both editions emit the same wavenumber layout for the same
    truncation (shared _spectral_wavenumbers): the (lat=n, lon=m)
    column pairs line up row-for-row."""
    from open_energy_data_server_spark.sources.grib2codec import (
        _spectral_wavenumbers,
    )

    t = 3
    n_coeff = (t + 1) * (t + 2) // 2
    raw = make_grib1_sh(0.0, [0] * (2 * n_coeff - 1), trunc=t)
    df = decode_grib2(raw)
    ns, ms = _spectral_wavenumbers(t)
    assert df["latitude"].tolist() == np.repeat(ns, 2).astype(float).tolist()
    assert df["longitude"].tolist() == np.repeat(ms, 2).astype(float).tolist()
