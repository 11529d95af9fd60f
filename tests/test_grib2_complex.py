"""GRIB2 complex-packing (templates 5.2 / 5.3) codec tests.

The encoder below lays out the section-5 template octets and the
section-7 group streams directly from the WMO template tables
(group references → widths → scaled lengths, each padded to a byte
boundary, then per-group deltas; 7.3 prepends sign-magnitude initial
values + overall minimum and spatial-differences the stream), so the
decoder is checked against the public format. Expected values are
hand-derived from ``value = (R + X·2^E)/10^D``.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from open_energy_data_server_spark.sources.grib2codec import decode_grib2
from tests.test_grib2codec import _sm, make_grib2


def _bits(vals, width) -> str:
    return "".join(format(int(v), f"0{width}b") for v in vals)


def _pad(b: str) -> str:
    return b + "0" * (-len(b) % 8)


def _tostr(bitstr: str) -> bytes:
    bitstr = _pad(bitstr)
    return bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))


def _sm_octets(v: int, n: int) -> bytes:
    if v < 0:
        return ((1 << (8 * n - 1)) | (-v)).to_bytes(n, "big")
    return v.to_bytes(n, "big")


def make_complex_sections(
    xs: list[int],
    group_size: int,
    r_ref: float,
    e_scale: int,
    d_scale: int,
    order: int = 0,
    extra_octets: int = 2,
) -> tuple[bytes, bytes, int]:
    """(sec5_payload_from_octet12, sec7_payload_from_octet6, nbits) for
    template 5.2 (order=0) or 5.3 (order 1/2)."""
    stream = list(xs)
    head = b""
    if order:
        ivals = stream[:order]
        d = list(stream)
        for _ in range(order):
            d = [d[0]] + [d[i] - d[i - 1] for i in range(1, len(d))]
        # positions < order are placeholders (decoder overwrites them)
        diffs = d[order:]
        gmin = min(diffs) if diffs else 0
        stream = [0] * order + [v - gmin for v in diffs]
        head = b"".join(_sm_octets(v, extra_octets) for v in ivals)
        head += _sm_octets(gmin, extra_octets)

    groups = [stream[i : i + group_size] for i in range(0, len(stream), group_size)]
    refs = [min(g) for g in groups]
    widths = [max(1, int(max(g) - r).bit_length()) if max(g) > r else 0
              for g, r in zip(groups, refs)]
    nbits = max(1, int(max(refs)).bit_length()) if max(refs) > 0 else 1
    width_ref = min(widths)
    width_bits = 8
    len_ref = group_size
    len_inc = 1
    len_bits = 8
    # scaled length = (true - ref) / inc; last group via len_last
    scaled_lens = [max(0, len(g) - len_ref) for g in groups]
    len_last = len(groups[-1])

    bitstr = _pad(_bits(refs, nbits))
    bitstr += _pad(_bits([w - width_ref for w in widths], width_bits))
    bitstr += _pad(_bits(scaled_lens, len_bits))
    for g, r, w in zip(groups, refs, widths):
        if w:
            bitstr += _bits([v - r for v in g], w)
    sec7 = head + _tostr(bitstr)

    tmpl = 3 if order else 2
    sec5 = (
        struct.pack(">f", r_ref)
        + _sm(e_scale, 2)
        + _sm(d_scale, 2)
        + bytes([nbits, 0])  # nbits, original field type
        + bytes([1, 0])  # general group splitting, no missing mgmt
        + (0).to_bytes(4, "big") * 2  # missing substitutes
        + len(groups).to_bytes(4, "big")
        + bytes([width_ref, width_bits])
        + len_ref.to_bytes(4, "big")
        + bytes([len_inc])
        + len_last.to_bytes(4, "big")
        + bytes([len_bits])
    )
    if order:
        sec5 += bytes([order, extra_octets])
    return sec5, sec7, tmpl


def make_grib2_complex(
    xs: list[int],
    ni: int,
    nj: int,
    group_size: int = 4,
    r_ref: float = 0.0,
    e_scale: int = 0,
    d_scale: int = 0,
    order: int = 0,
) -> bytes:
    """Full message: reuse make_grib2's scaffolding (sections 0-4, 6)
    and splice in the complex sections 5 and 7."""
    base = make_grib2(xs, ni=ni, nj=nj, r_ref=r_ref, e_scale=e_scale,
                      d_scale=d_scale, nbits=8)
    # walk the section chain to find+replace sections 5 and 7
    sec5_pl, sec7_pl, tmpl = make_complex_sections(
        xs, group_size, r_ref, e_scale, d_scale, order=order
    )
    out, off = [base[:16]], 16
    while off < len(base) - 4:
        ln = int.from_bytes(base[off : off + 4], "big")
        sec = base[off : off + ln]
        num = sec[4]
        if num == 5:
            body = (
                b"\x05" + len(xs).to_bytes(4, "big")
                + tmpl.to_bytes(2, "big") + sec5_pl
            )
            sec = (len(body) + 4).to_bytes(4, "big") + body
        elif num == 7:
            body = b"\x07" + sec7_pl
            sec = (len(body) + 4).to_bytes(4, "big") + body
        out.append(sec)
        off += ln
    total = sum(len(s) for s in out) + 4
    out[0] = b"GRIB" + b"\x00\x00" + bytes([base[6], 2]) + total.to_bytes(8, "big")
    return b"".join(out) + b"7777"


XS = [100, 102, 101, 105, 7, 9, 8, 6, 250, 251, 252, 250, 13]


def test_complex_packing_52_roundtrip():
    raw = make_grib2_complex(XS, ni=13, nj=1, group_size=4)
    df = decode_grib2(raw).sort_values("longitude").reset_index(drop=True)
    assert df["value"].tolist() == [float(v) for v in XS]


def test_complex_packing_52_scaling():
    # value = (R + X·2^E)/10^D with R=50, E=1, D=1
    raw = make_grib2_complex(XS, ni=13, nj=1, group_size=5,
                             r_ref=50.0, e_scale=1, d_scale=1)
    df = decode_grib2(raw).sort_values("longitude").reset_index(drop=True)
    assert df["value"].tolist() == [(50.0 + v * 2.0) / 10.0 for v in XS]


def test_complex_packing_53_first_order():
    raw = make_grib2_complex(XS, ni=13, nj=1, group_size=4, order=1)
    df = decode_grib2(raw).sort_values("longitude").reset_index(drop=True)
    assert df["value"].tolist() == [float(v) for v in XS]


def test_complex_packing_53_second_order_smooth_field():
    # a smooth quadratic-ish series — the case spatial differencing
    # exists for (tiny second differences)
    xs = [int(1000 + 3 * i + (i * i) // 4) for i in range(40)]
    raw = make_grib2_complex(xs, ni=40, nj=1, group_size=8, order=2)
    df = decode_grib2(raw).sort_values("longitude").reset_index(drop=True)
    assert df["value"].tolist() == [float(v) for v in xs]


def test_complex_packing_53_negative_differences():
    xs = [500, 400, 320, 250, 300, 280, 275, 290]  # falling → negative diffs
    raw = make_grib2_complex(xs, ni=8, nj=1, group_size=3, order=1)
    df = decode_grib2(raw).sort_values("longitude").reset_index(drop=True)
    assert df["value"].tolist() == [float(v) for v in xs]


def test_complex_packing_missing_mgmt_rejected():
    raw = bytearray(make_grib2_complex(XS, ni=13, nj=1))
    # flip the missing-value-management octet (section 5, octet 23)
    off = 16
    while True:
        ln = int.from_bytes(raw[off : off + 4], "big")
        if raw[off + 4] == 5:
            raw[off + 22] = 1
            break
        off += ln
    with pytest.raises(ValueError, match="missing-value management"):
        decode_grib2(bytes(raw))


def test_complex_packing_length_mismatch_rejected():
    raw = bytearray(make_grib2_complex(XS, ni=13, nj=1, group_size=4))
    off = 16
    while True:
        ln = int.from_bytes(raw[off : off + 4], "big")
        if raw[off + 4] == 5:
            # corrupt true-length-of-last-group (octets 43-46)
            raw[off + 42 : off + 46] = (99).to_bytes(4, "big")
            break
        off += ln
    with pytest.raises(ValueError, match="group lengths sum"):
        decode_grib2(bytes(raw))


def _patch_to_gaussian(raw: bytes, n: int) -> bytes:
    """Rewrite a make_grib2 message's section 3 from template 3.0 to
    3.40: template number 40, octets 68-71 = N (replacing Dj)."""
    out = bytearray(raw)
    off = 16
    while True:
        ln = int.from_bytes(out[off : off + 4], "big")
        if out[off + 4] == 3:
            out[off + 12 : off + 14] = (40).to_bytes(2, "big")
            out[off + 67 : off + 71] = n.to_bytes(4, "big")
            break
        off += ln
    return bytes(out)


def test_gaussian_grid_latitudes_closed_form():
    """N=2 → 4 rows at the P4 Legendre roots: lat = ±asin(sqrt(
    (30 ± sqrt(480))/70)) — closed-form quartic roots, independent of
    numpy's quadrature routine."""
    import math

    lat_outer = math.degrees(math.asin(math.sqrt((30 + math.sqrt(480)) / 70)))
    lat_inner = math.degrees(math.asin(math.sqrt((30 - math.sqrt(480)) / 70)))
    want = [lat_outer, lat_inner, -lat_inner, -lat_outer]  # north → south

    base = make_grib2(
        list(range(8)), ni=2, nj=4,
        lat1=lat_outer, lon1=0.0, dlon=180.0,
        r_ref=0.0, e_scale=0, d_scale=0,
    )
    df = decode_grib2(_patch_to_gaussian(base, 2))
    got = sorted(set(df["latitude"]), reverse=True)
    assert len(got) == 4
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=1e-9)
    # values land row-major north→south
    row0 = df[df["latitude"] == got[0]].sort_values("longitude")
    assert row0["value"].tolist() == [0.0, 1.0]


def test_gaussian_subarea_rows():
    """nj < 2N: rows start at the Gaussian latitude nearest La1."""
    import math

    lat_inner = math.degrees(math.asin(math.sqrt((30 - math.sqrt(480)) / 70)))
    base = make_grib2(
        [1, 2, 3, 4], ni=2, nj=2,
        lat1=lat_inner, lon1=0.0, dlon=90.0,
        r_ref=0.0, e_scale=0, d_scale=0,
    )
    df = decode_grib2(_patch_to_gaussian(base, 2))
    got = sorted(set(df["latitude"]), reverse=True)
    assert got[0] == pytest.approx(lat_inner, abs=1e-9)
    assert got[1] == pytest.approx(-lat_inner, abs=1e-9)


def test_reduced_gaussian_decodes_ragged_rows():
    """The ECMWF O-grid shape: per-row point counts in the optional
    list (octet 11 = entry width, octet 12 = interpretation 1), rows
    ragged, each circle evenly spaced from Lo1."""
    import math

    row_ni = [2, 4, 4, 2]
    xs = list(range(sum(row_ni)))
    base = make_grib2(xs, ni=1, nj=4, lat1=59.4444, lon1=0.0,
                      r_ref=0.0, e_scale=0, d_scale=0)
    out, off = [base[:16]], 16
    while off < len(base) - 4:
        ln = int.from_bytes(base[off : off + 4], "big")
        sec = bytearray(base[off : off + ln])
        if sec[4] == 3:
            sec[12:14] = (40).to_bytes(2, "big")  # template 3.40
            sec[67:71] = (2).to_bytes(4, "big")  # N = 2
            sec[30:34] = b"\xff\xff\xff\xff"  # Ni missing
            sec[10] = 2  # 2 octets per list entry
            sec[11] = 1  # interpretation: points per row
            sec = sec[:72] + b"".join(
                k.to_bytes(2, "big") for k in row_ni
            ) + sec[72:]
            sec[0:4] = len(sec).to_bytes(4, "big")
        out.append(bytes(sec))
        off += ln
    total = sum(len(p) for p in out) + 4
    out[0] = b"GRIB" + b"\x00\x00" + bytes([base[6], 2]) + total.to_bytes(8, "big")
    df = decode_grib2(b"".join(out) + b"7777")
    assert len(df) == 12
    lat_outer = math.degrees(math.asin(math.sqrt((30 + math.sqrt(480)) / 70)))
    lat_inner = math.degrees(math.asin(math.sqrt((30 - math.sqrt(480)) / 70)))
    counts = df.groupby("latitude").size().sort_index(ascending=False)
    assert counts.tolist() == row_ni
    assert counts.index[0] == pytest.approx(lat_outer, abs=1e-9)
    assert counts.index[1] == pytest.approx(lat_inner, abs=1e-9)
    # first (northern, 2-point) row: lons 0 and 180; values row-major
    row0 = df[df["latitude"] == counts.index[0]].sort_values("longitude")
    assert row0["longitude"].tolist() == [0.0, 180.0]
    assert row0["value"].tolist() == [0.0, 1.0]
    # a 4-point row: lons every 90 degrees
    row1 = df[df["latitude"] == counts.index[1]].sort_values("longitude")
    assert row1["longitude"].tolist() == [0.0, 90.0, 180.0, 270.0]
