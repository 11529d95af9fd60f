"""GRIB2 spectral data (grid template 3.50 + DRS template 5.51).

The fixture encoder below is test-side and independent of the decoder
(section layouts hand-assembled from the public WMO FM 92 template
tables). The reference reads ECMWF fields via cfgrib
(/root/reference/crawler/ecmwf.py:135-141), which decodes spectral
messages transparently; this covers the same shape pure-Python.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from open_energy_data_server_spark.sources.grib2codec import (
    _spectral_wavenumbers,
    decode_grib2,
)
from tests.test_grib2codec import _pack_values, _sm


def make_grib2_spectral(
    unpacked: list[float],
    packed_x: list[int],
    trunc: int,
    js: int,
    p_millionths: int = 1_000_000,
    r_ref: float = 0.0,
    e_scale: int = 0,
    d_scale: int = 0,
    nbits: int = 8,
    precision: int = 1,
    ref_time=(2024, 1, 2, 3, 0, 0),
    n_points_override: int | None = None,
    ts_override: int | None = None,
) -> bytes:
    """Assemble one GRIB2 message with spherical-harmonic coefficients:
    triangular truncation ``trunc``, sub-truncation ``js`` stored raw
    (``unpacked`` floats), the rest simple-packed from the integer
    fields ``packed_x`` (value = (R + X·2^E)/10^D, Laplacian-scaled)."""
    n_coeff = (trunc + 1) * (trunc + 2) // 2
    n_points = (
        n_points_override if n_points_override is not None else 2 * n_coeff
    )
    ts = ts_override if ts_override is not None else len(unpacked)

    sec1 = (
        b"\x01"
        + (0).to_bytes(2, "big") * 2
        + bytes([2, 0, 1])
        + ref_time[0].to_bytes(2, "big")
        + bytes(ref_time[1:])
        + bytes([0, 1])
    )
    sec1 = (len(sec1) + 4).to_bytes(4, "big") + sec1

    # template 3.50: J, K, M pentagonal resolution parameters only
    sec3 = (
        b"\x03"
        + bytes([0])
        + n_points.to_bytes(4, "big")
        + bytes([0, 0])
        + (50).to_bytes(2, "big")
        + trunc.to_bytes(4, "big") * 3
    )
    sec3 = (len(sec3) + 4).to_bytes(4, "big") + sec3

    sec4 = (
        b"\x04"
        + (0).to_bytes(2, "big")
        + (0).to_bytes(2, "big")
        + bytes([3, 5, 2, 0, 0])  # category 3, number 5 (geopotential-ish)
        + (0).to_bytes(2, "big")
        + bytes([0, 1])
        + (0).to_bytes(4, "big")
        + bytes([1, 0])
        + (0).to_bytes(4, "big")
        + bytes([255, 0])
        + (0).to_bytes(4, "big")
    )
    sec4 = (len(sec4) + 4).to_bytes(4, "big") + sec4

    # template 5.51: R, E, D, nbits, P(×10⁻⁶ signed), Js, Ks, Ms, Ts,
    # unpacked-subset precision
    sec5 = (
        b"\x05"
        + n_points.to_bytes(4, "big")
        + (51).to_bytes(2, "big")
        + struct.pack(">f", r_ref)
        + _sm(e_scale, 2)
        + _sm(d_scale, 2)
        + bytes([nbits])
        + _sm(p_millionths, 4)
        + js.to_bytes(2, "big") * 3
        + ts.to_bytes(4, "big")
        + bytes([precision])
    )
    sec5 = (len(sec5) + 4).to_bytes(4, "big") + sec5

    sec6 = b"\x06" + bytes([255])
    sec6 = (len(sec6) + 4).to_bytes(4, "big") + sec6

    fmt = ">f" if precision == 1 else ">d"
    sec7 = (
        b"\x07"
        + b"".join(struct.pack(fmt, v) for v in unpacked)
        + _pack_values(packed_x, nbits)
    )
    sec7 = (len(sec7) + 4).to_bytes(4, "big") + sec7

    body = sec1 + sec3 + sec4 + sec5 + sec6 + sec7
    total = 16 + len(body) + 4
    sec0 = b"GRIB" + b"\x00\x00" + bytes([0, 2]) + total.to_bytes(8, "big")
    return sec0 + body + b"7777"


def test_spectral_decode_hand_computed():
    """T2 field, T0 subset, p=1: packed coefficient = X / (n(n+1)).
    Storage order m-major: (0,0) (1,0) (2,0) (1,1) (2,1) (2,2)."""
    raw = make_grib2_spectral(
        unpacked=[5.5, 0.0],  # (0,0) re, im
        # (1,0) (2,0) (1,1) (2,1) (2,2) → λ = 2 6 2 6 6
        packed_x=[2, 4, 12, 18, 4, 6, 30, 36, 12, 24],
        trunc=2,
        js=0,
    )
    df = decode_grib2(raw)
    assert len(df) == 12
    assert set(df["variable"]) == {"d0c3n5_sh_re", "d0c3n5_sh_im"}
    # wavenumber columns: (n, m) per coefficient, two rows each
    assert df["latitude"].tolist() == [0, 0, 1, 1, 2, 2, 1, 1, 2, 2, 2, 2]
    assert df["longitude"].tolist() == [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2]
    expect = [5.5, 0.0] + [
        x / lam
        for x, lam in zip(
            [2, 4, 12, 18, 4, 6, 30, 36, 12, 24],
            [2, 2, 6, 6, 2, 2, 6, 6, 6, 6],
        )
    ]
    np.testing.assert_allclose(df["value"].to_numpy(), expect, rtol=1e-12)


def test_spectral_scaling_and_subset():
    """Non-trivial R/E/D, fractional Laplacian exponent, larger
    subset: T3 with T1 unpacked (3+... → (n≤1) = (0,0),(1,0),(1,1))."""
    trunc, js, p = 3, 1, 0.5
    ns, ms = _spectral_wavenumbers(trunc)
    sub = ns <= js
    n_packed = int((~sub).sum()) * 2
    x = list(range(10, 10 + n_packed))
    r_ref, e, d = 2.0, -1, 1
    raw = make_grib2_spectral(
        unpacked=[1.5, 0.0, 2.25, -0.5, 3.0, 0.125],
        packed_x=x,
        trunc=trunc,
        js=js,
        p_millionths=500_000,
        r_ref=r_ref,
        e_scale=e,
        d_scale=d,
        nbits=6,
    )
    df = decode_grib2(raw)
    assert len(df) == 2 * ns.size
    y = (r_ref + np.array(x, dtype=float) * 2.0**e) / 10.0**d
    lam = np.repeat(
        (ns[~sub] * (ns[~sub] + 1.0)) ** p, 2
    )
    got_packed = df["value"].to_numpy()[np.repeat(sub, 2) == False]  # noqa: E712
    np.testing.assert_allclose(got_packed, y / lam, rtol=1e-12)
    got_unpacked = df["value"].to_numpy()[np.repeat(sub, 2)]
    np.testing.assert_allclose(
        got_unpacked, [1.5, 0.0, 2.25, -0.5, 3.0, 0.125], rtol=1e-12
    )


def test_spectral_64bit_subset_precision():
    raw = make_grib2_spectral(
        unpacked=[1.0000000001, -2.0000000002],
        packed_x=[2, 4, 12, 18, 4, 6, 30, 36, 12, 24],
        trunc=2,
        js=0,
        precision=2,
    )
    df = decode_grib2(raw)
    np.testing.assert_allclose(
        df["value"].to_numpy()[:2], [1.0000000001, -2.0000000002], rtol=0
    )


def test_spectral_rejects_pentagonal_and_bad_counts():
    ok = dict(
        unpacked=[5.5, 0.0],
        packed_x=[2, 4, 12, 18, 4, 6, 30, 36, 12, 24],
        trunc=2,
        js=0,
    )
    with pytest.raises(ValueError, match="DRS says"):
        decode_grib2(make_grib2_spectral(**ok, n_points_override=10))
    with pytest.raises(ValueError, match="inconsistent with sub-truncation"):
        decode_grib2(make_grib2_spectral(**ok, ts_override=4))
    # pentagonal truncation (J != M) routes to the cfgrib seam
    raw = bytearray(make_grib2_spectral(**ok))
    pos = raw.find((50).to_bytes(2, "big"), 30)  # template number in sec3
    raw[pos + 2 : pos + 6] = (3).to_bytes(4, "big")  # J=3, K=M=2
    with pytest.raises(ValueError, match="pentagonal"):
        decode_grib2(bytes(raw))


def test_spectral_truncated_payload_raises():
    raw = make_grib2_spectral(
        unpacked=[5.5, 0.0],
        packed_x=[2, 4, 12, 18, 4, 6, 30, 36, 12, 24],
        trunc=2,
        js=0,
    )
    # drop the last 6 bytes of the message body (before '7777')
    cut = raw[:-10] + raw[-4:]
    with pytest.raises(ValueError):
        decode_grib2(cut)


def test_spark_read_grib_spectral(spark, tmp_path):
    raw = make_grib2_spectral(
        unpacked=[5.5, 0.0],
        packed_x=[2, 4, 12, 18, 4, 6, 30, 36, 12, 24],
        trunc=2,
        js=0,
    )
    (tmp_path / "sh.grib2").write_bytes(raw)
    from open_energy_data_server_spark.sources.grib import read_grib

    df = read_grib(spark, str(tmp_path / "sh.grib2"))
    rows = df.collect()
    assert len(rows) == 12
    re_00 = [
        r
        for r in rows
        if r.variable.endswith("_sh_re") and r.latitude == 0.0 and r.longitude == 0.0
    ]
    assert len(re_00) == 1 and abs(re_00[0].value - 5.5) < 1e-12


def test_spectral_roundtrip_property():
    """Randomized encode→decode round-trips across truncations,
    sub-truncations, scalings and bit widths (mirrors the property
    suites of the other codecs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        trunc=st.integers(min_value=1, max_value=6),
        data=st.data(),
        e_scale=st.integers(min_value=-3, max_value=3),
        d_scale=st.integers(min_value=-1, max_value=2),
        nbits=st.integers(min_value=1, max_value=16),
        p_mil=st.sampled_from([0, 500_000, 1_000_000, 2_000_000, -500_000]),
    )
    def check(trunc, data, e_scale, d_scale, nbits, p_mil):
        ns, _ = _spectral_wavenumbers(trunc)
        js = data.draw(st.integers(min_value=0, max_value=trunc - 1))
        sub = ns <= js
        n_unp = int(sub.sum()) * 2
        n_pk = int((~sub).sum()) * 2
        unpacked = [
            float(np.float32(data.draw(st.floats(-1e3, 1e3, width=32))))
            for _ in range(n_unp)
        ]
        xs = [data.draw(st.integers(0, (1 << nbits) - 1)) for _ in range(n_pk)]
        r_ref = float(np.float32(data.draw(st.floats(-100, 100, width=32))))
        raw = make_grib2_spectral(
            unpacked, xs, trunc, js,
            p_millionths=p_mil, r_ref=r_ref,
            e_scale=e_scale, d_scale=d_scale, nbits=nbits,
        )
        df = decode_grib2(raw)
        assert len(df) == 2 * ns.size
        got = df["value"].to_numpy()
        mask2 = np.repeat(sub, 2)
        np.testing.assert_allclose(got[mask2], unpacked, rtol=0)
        y = (r_ref + np.array(xs, dtype=float).reshape(-1) * 2.0**e_scale) / (
            10.0**d_scale
        )
        n_of = np.repeat(ns[~sub].astype(float), 2)
        lam = (n_of * (n_of + 1.0)) ** (p_mil / 1e6)
        np.testing.assert_allclose(got[~mask2], y / lam, rtol=1e-12)

    check()
