"""Pure-Python GRIB edition 1 decoder (WMO FM 92 GRIB Ed.1, public spec).

Completes the weather-ingest path for the reference's largest dataset:
DWD COSMO REA6 monthly files are GRIB1 read via pygrib
(/root/reference/crawler/dwd.py:120-147); the repo's GRIB2 codec
(``sources.grib2codec``) previously raised on edition 1. Scope mirrors
what that crawler's files contain:

- Indicator section: ``GRIB`` + 3-octet total length + edition 1.
- PDS (product definition): parameter indicator (code table 2),
  reference time from year-of-century + century, forecast lead from
  unit/P1/P2/time-range-indicator, decimal scale factor D.
- GDS grid types 0 (regular latitude/longitude, millidegrees) and
  10 (ROTATED latitude/longitude — the COSMO grid: the codec
  unrotates to true geographic coordinates, matching what pygrib's
  ``latlons()`` hands the reference).
- BMS bitmap (table reference 0).
- BDS simple packing: ``value = (R + X·2^E) / 10^D`` with R an IBM
  hexadecimal 32-bit float (GRIB1's one real curveball vs GRIB2's
  IEEE reference value) and X a big-endian ``nbits`` field per point.

The bit unpack is shared with the GRIB2 codec (one ``unpackbits`` +
matmul — no per-point Python), so a COSMO 824×848 field decodes in
milliseconds inside an executor Arrow batch.

- BDS second-order (complex) packing, the older-DWD-archive form
  pygrib decodes transparently: per-group first-order values plus
  per-point second-order deviations, with constant or per-group
  widths, grouped row-by-row or by an explicit secondary bitmap —
  ``value = (R + (FO_group + SO_point)·2^E) / 10^D``.

  Boustrophedonic (serpentine) point ordering is supported on full
  rows: alternate rows decode right-to-left and are flipped back to
  the uniform i-fastest grid order.

- Spherical-harmonic coefficients (GDS representation type 50,
  triangular truncation, SIMPLE packing): real(0,0) from BDS octets
  12-15 (IBM float ×10^D, GRIBEX convention), remaining coefficients
  simple-packed in IFS order — emitted as (total, zonal)-wavenumber
  rows exactly like the GRIB2 spectral path (shared
  ``_spectral_wavenumbers``).

Deliberately NOT implemented (raise ValueError; callers inject
cfgrib/pygrib via ``read_grib(..., decoder=...)``): matrix /
general-extended second-order variants, COMPLEX-packed spherical
harmonics (the ECMWF MARS sub-spectrum layout) and pentagonal
truncations, grids other than (rotated) lat/lon, j-consecutive
scanning.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from open_energy_data_server_spark.sources.grib2codec import (
    _spectral_wavenumbers,
    _u,
    _unpack_bits,
)

# GRIB1 code table 4 (time unit) → timedelta of one unit. This table
# DIFFERS from GRIB2's table 4.4: in edition 1, 13/14 are 15/30 minutes
# and "second" is 254 (GRIB2 uses 13 for second).
_TIME_UNIT_ED1 = {
    0: timedelta(minutes=1),
    1: timedelta(hours=1),
    2: timedelta(days=1),
    10: timedelta(hours=3),
    11: timedelta(hours=6),
    12: timedelta(hours=12),
    13: timedelta(minutes=15),
    14: timedelta(minutes=30),
    254: timedelta(seconds=1),
}

# GRIB1 code table 2 (WMO standard) → short names for the variables the
# COSMO REA6 / DWD downloads carry; unknown indicators fall back to a
# systematic ``p<indicator>`` code.
PARAM_NAMES_ED1 = {
    1: "pres",  # pressure
    11: "t",  # temperature (K)
    33: "u",  # u-component of wind
    34: "v",  # v-component of wind
    52: "r",  # relative humidity
    61: "tp",  # total precipitation
    111: "nswrf",  # net short-wave radiation flux (surface)
    112: "nlwrf",  # net long-wave radiation flux (surface)
}


def _ibm_float(b: bytes) -> float:
    """IBM System/360 hexadecimal 32-bit float (GRIB1 reference value):
    (-1)^s · 16^(A-64) · M/2^24 — sign bit, 7-bit base-16 exponent
    biased by 64, 24-bit mantissa."""
    w = int.from_bytes(b, "big")
    sign = -1.0 if w & 0x8000_0000 else 1.0
    a = (w >> 24) & 0x7F
    m = w & 0x00FF_FFFF
    return sign * m * 16.0 ** (a - 64) / 2**24


def _s3(b: bytes, off: int) -> int:
    """3-octet sign-magnitude signed int (GRIB1 lat/lon encoding)."""
    raw = _u(b, off, 3)
    if raw & 0x80_0000:
        return -(raw & 0x7F_FFFF)
    return raw


def _s2(b: bytes, off: int) -> int:
    raw = _u(b, off, 2)
    if raw & 0x8000:
        return -(raw & 0x7FFF)
    return raw


def unrotate(
    lat_r: np.ndarray, lon_r: np.ndarray, lat_sp: float, lon_sp: float
) -> tuple[np.ndarray, np.ndarray]:
    """Rotated-pole → true geographic coordinates (degrees), the
    standard COSMO transformation: the rotated system's NORTH pole
    sits at (−lat_sp, lon_sp − 180)."""
    phi_p = np.radians(-lat_sp)
    lam_p = lon_sp - 180.0
    phi_r = np.radians(lat_r)
    lam_r = np.radians(lon_r)
    sin_phi = np.sin(phi_p) * np.sin(phi_r) + np.cos(phi_p) * np.cos(
        phi_r
    ) * np.cos(lam_r)
    lat = np.degrees(np.arcsin(np.clip(sin_phi, -1.0, 1.0)))
    lon = lam_p + np.degrees(
        np.arctan2(
            -np.cos(phi_r) * np.sin(lam_r),
            np.cos(phi_p) * np.sin(phi_r)
            - np.sin(phi_p) * np.cos(phi_r) * np.cos(lam_r),
        )
    )
    return lat, lon % 360.0


def _decode_second_order(
    bds: bytes,
    e_scale: int,
    r_ref: float,
    d_scale: int,
    n_values: int,
    ni: int = 0,
) -> np.ndarray:
    """GRIB1 grid-point second-order packing (WMO Ed.1 BDS, flag bit 2):
    P1 first-order group values (octet-11 width, starting at pointer
    N1) plus P2 per-point second-order deviations (per-group widths
    from octet 22, starting at pointer N2). Points map to groups via
    an explicit secondary bitmap (extended flag bit 2: a 1 starts a
    new group) or, absent one, row-by-row (P2/P1 equal rows — the
    classic gribex layout older DWD archives carry).
    ``value = (R + (FO + SO)·2^E) / 10^D``."""
    if (bds[3] >> 4) & 0x1 == 0:
        raise ValueError(
            "GRIB1 second-order packing without extended flags (octet 14)"
        )
    if len(bds) < 22:
        raise ValueError("GRIB1 second-order BDS too short for its pointers")
    ext = bds[13]
    if ext & 0x80:
        raise ValueError("GRIB1 matrix-of-values packing unsupported")
    if ext & 0x10:
        raise ValueError(
            "GRIB1 general extended second-order packing unsupported; "
            "inject a pygrib/cfgrib decoder"
        )
    boustrophedonic = bool(ext & 0x08)
    if boustrophedonic and (ni == 0 or n_values % ni):
        # serpentine ordering is defined per grid ROW; with a primary
        # bitmap the stored sequence has irregular row lengths
        raise ValueError(
            "GRIB1 boustrophedonic ordering requires full rows "
            "(no primary bitmap)"
        )
    has_sec_bitmap = bool(ext & 0x40)
    diff_widths = bool(ext & 0x20)
    n1, n2 = _u(bds, 11, 2), _u(bds, 14, 2)
    p1, p2 = _u(bds, 16, 2), _u(bds, 18, 2)
    if p2 != n_values:
        raise ValueError(
            f"GRIB1 second-order P2={p2} != expected {n_values} points"
        )
    if p1 == 0 or n1 < 22 or n2 < n1 or n2 > len(bds):
        raise ValueError("GRIB1 second-order pointers/counts inconsistent")
    pos = 21  # 0-based offset of octet 22
    if diff_widths:
        if pos + p1 > len(bds):
            raise ValueError("GRIB1 second-order width table truncated")
        widths = np.frombuffer(bds[pos : pos + p1], dtype=np.uint8).astype(
            np.int64
        )
        pos += p1
    else:
        widths = np.full(p1, bds[pos], dtype=np.int64)
        pos += 1
    if has_sec_bitmap:
        nbytes = (p2 + 7) // 8
        if pos + nbytes > n1 - 1:
            raise ValueError("GRIB1 secondary bitmap truncated")
        sb = np.unpackbits(
            np.frombuffer(bds[pos : pos + nbytes], dtype=np.uint8)
        )[:p2].astype(bool)
        if p2 and not sb[0]:
            raise ValueError(
                "GRIB1 secondary bitmap must start a group at point 0"
            )
        groups = np.cumsum(sb) - 1
        if p2 and groups[-1] + 1 != p1:
            raise ValueError(
                f"GRIB1 secondary bitmap marks {int(groups[-1]) + 1} "
                f"groups, header says P1={p1}"
            )
    else:
        if p2 % p1:
            raise ValueError(
                f"GRIB1 row-by-row second-order packing needs P1 | P2, "
                f"got P1={p1}, P2={p2}"
            )
        groups = np.repeat(np.arange(p1), p2 // p1)
    fo = _unpack_bits(bds[n1 - 1 :], p1, bds[10])
    # second-order deviations: variable per-point widths → gather bits
    # by distinct width (few distinct values), vectorized per width
    so_bits = widths[groups]
    total = int(so_bits.sum())
    raw = np.unpackbits(np.frombuffer(bds[n2 - 1 :], dtype=np.uint8))
    if raw.size < total:
        raise ValueError(
            f"GRIB1 second-order data too short: {raw.size} bits < {total}"
        )
    ends = np.cumsum(so_bits)
    so = np.zeros(p2, dtype=np.float64)
    for w in np.unique(so_bits):
        if w == 0:
            continue
        idx = np.nonzero(so_bits == w)[0]
        offs = (ends[idx] - w)[:, None] + np.arange(w)[None, :]
        wts = (1 << np.arange(w - 1, -1, -1)).astype(np.float64)
        so[idx] = raw[offs].astype(np.float64) @ wts
    values = (r_ref + (fo[groups] + so) * (2.0**e_scale)) / (10.0**d_scale)
    if boustrophedonic:
        # alternate rows are stored right-to-left (gribex serpentine
        # scan); flip them back to the uniform i-fastest grid order
        grid = values.reshape(-1, ni)
        grid[1::2] = grid[1::2, ::-1]
        values = grid.reshape(-1)
    return values


def _decode_spectral1(
    bds: bytes,
    gds: bytes,
    param: int,
    valid_time,
    d_scale: int,
) -> pd.DataFrame:
    """GRIB1 spherical-harmonic coefficients, SIMPLE packing (WMO Ed.1
    GDS data-representation type 50 + BDS flag bit 1): octets 12-15 of
    the BDS hold the real (0,0) coefficient — the global mean — as an
    IBM float pre-multiplied by 10^D (GRIBEX convention), the
    remaining 2·ncoeff−1 values simple-packed from octet 16 in the
    IFS storage order (m slowest, n = m..T per m, re/im interleaved —
    the same layout the GRIB2 spectral path emits, so both editions
    share `_spectral_wavenumbers`). Complex packing (representation
    mode 2 / BDS flag bit 2 — the ECMWF MARS archive form) raises to
    the ``read_grib(decoder=)`` injection seam."""
    j, k, m = _u(gds, 6, 2), _u(gds, 8, 2), _u(gds, 10, 2)
    if not (j == k == m):
        raise ValueError(
            f"GRIB1 pentagonal spectral truncation J={j} K={k} M={m} "
            "unsupported (triangular only); inject a pygrib/cfgrib decoder"
        )
    if j > 4096:  # (T+1)(T+2)/2 coefficients; operational is ≤ T1279
        raise ValueError(f"implausible GRIB1 spectral truncation T{j}")
    if gds[12] != 1:
        raise ValueError(
            f"GRIB1 spectral representation type {gds[12]} is not 1 "
            "(associated Legendre polynomials of the first kind)"
        )
    flags = bds[3] >> 4
    if not flags & 0x8:
        raise ValueError(
            "GRIB1 grid-point BDS under a spherical-harmonic GDS — "
            "corrupt message"
        )
    if gds[13] == 2 or flags & 0x4:
        raise ValueError(
            "GRIB1 complex-packed spherical harmonics unsupported "
            "(sub-spectrum layout); inject a pygrib/cfgrib decoder"
        )
    if gds[13] != 1:
        raise ValueError(
            f"GRIB1 spectral representation mode {gds[13]} not in "
            "code table 10 (1 simple / 2 complex)"
        )
    unused_bits = bds[3] & 0x0F
    e_scale = _s2(bds, 4)
    r_ref = _ibm_float(bds[6:10])
    nbits = bds[10]
    real00 = _ibm_float(bds[11:15]) / (10.0**d_scale)
    ns, ms = _spectral_wavenumbers(j)
    n_rest = 2 * ns.size - 1
    if nbits > 0:
        avail = (len(bds) - 15) * 8 - unused_bits
        if avail < n_rest * nbits:
            raise ValueError(
                f"GRIB1 spectral data section too short: {avail} bits "
                f"< {n_rest * nbits}"
            )
    packed = _unpack_bits(bds[15:], n_rest, nbits)
    rest = (r_ref + packed * (2.0**e_scale)) / (10.0**d_scale)
    values = np.concatenate(([real00], rest))

    var = PARAM_NAMES_ED1.get(param, f"p{param}")
    part = np.tile([f"{var}_sh_re", f"{var}_sh_im"], ns.size)
    return pd.DataFrame(
        {
            "time": pd.Timestamp(valid_time),
            # spectral space has no geometry: the two geometry columns
            # carry the coefficient's (total, zonal) wavenumber pair
            # (same contract as the GRIB2 spectral path)
            "latitude": np.repeat(ns, 2).astype(np.float64),
            "longitude": np.repeat(ms, 2).astype(np.float64),
            "variable": part,
            "value": values.astype(np.float64),
        }
    )


def _decode_message1(buf: bytes, start: int) -> tuple[pd.DataFrame, int]:
    """Decode one GRIB1 message starting at ``start``; return
    (long-frame, offset-after-message)."""
    if buf[start : start + 4] != b"GRIB":
        raise ValueError(f"not a GRIB message at offset {start}")
    if buf[start + 7] != 1:
        raise ValueError(f"GRIB edition {buf[start + 7]} is not 1")
    total_len = _u(buf, start + 4, 3)
    end = start + total_len
    if buf[end - 4 : end] != b"7777":
        raise ValueError("GRIB1 message missing 7777 trailer")

    # --- PDS ---
    off = start + 8
    pds = buf[off : off + _u(buf, off, 3)]
    has_gds = bool(pds[7] & 0x80)
    has_bms = bool(pds[7] & 0x40)
    if not has_gds:
        raise ValueError(
            "GRIB1 message without GDS (catalogued grid id only) unsupported"
        )
    param = pds[8]
    yoc, month, day, hour, minute = pds[12], pds[13], pds[14], pds[15], pds[16]
    century = pds[24]
    year = (century - 1) * 100 + yoc if yoc < 100 else century * 100
    ref_time = datetime(year, month, day, hour, minute)
    unit = _TIME_UNIT_ED1.get(pds[17])
    p1, p2, tri = pds[18], pds[19], pds[20]
    if unit is None:
        raise ValueError(
            f"GRIB1 time unit {pds[17]} not in code table 4 subset "
            "(0-2,10-14,254) — inject a pygrib decoder"
        )
    if tri == 10:  # P1P2 as one 16-bit value
        lead = (p1 * 256 + p2) * unit
    elif tri in (2, 3, 4, 5):  # period products valid at end of [P1,P2]
        lead = p2 * unit
    else:
        lead = p1 * unit
    d_scale = _s2(pds, 26)
    off += len(pds)

    # --- GDS ---
    gds = buf[off : off + _u(buf, off, 3)]
    rep_type = gds[5]
    if rep_type == 50:
        if has_bms:
            raise ValueError(
                "GRIB1 spherical-harmonic message with a bitmap is "
                "malformed (coefficients have no missing points)"
            )
        off += len(gds)
        return _decode_spectral1(
            buf[off : off + _u(buf, off, 3)],
            gds,
            param,
            ref_time + lead,
            d_scale,
        ), end
    if rep_type not in (0, 10):
        raise ValueError(
            f"GRIB1 grid type {rep_type} unsupported (only 0 latlon / "
            "10 rotated latlon / 50 spherical harmonics); inject a "
            "pygrib/cfgrib decoder"
        )
    ni, nj = _u(gds, 6, 2), _u(gds, 8, 2)
    if ni * nj > 1 << 26:  # corrupt counts → OOM guard (COSMO ≈ 700k)
        raise ValueError(f"implausible GRIB1 grid {ni}x{nj} (> 2^26 points)")
    la1, lo1 = _s3(gds, 10) / 1e3, _s3(gds, 13) / 1e3
    la2, lo2 = _s3(gds, 17) / 1e3, _s3(gds, 20) / 1e3
    scan = gds[27]
    if scan & 0x20:
        raise ValueError("GRIB1 j-consecutive scanning unsupported")
    # first→last point linspace encodes the scan direction for free;
    # +i with wraparound needs the 360° unwind
    if not (scan & 0x80) and lo2 < lo1:
        lo2 += 360.0
    lats_1d = np.linspace(la1, la2, nj)
    lons_1d = np.linspace(lo1, lo2, ni)
    if rep_type == 10:
        lat_sp, lon_sp = _s3(gds, 32) / 1e3, _s3(gds, 35) / 1e3
        grid_lat, grid_lon = unrotate(
            np.repeat(lats_1d, ni), np.tile(lons_1d, nj), lat_sp, lon_sp
        )
    else:
        grid_lat = np.repeat(lats_1d, ni)
        grid_lon = np.tile(lons_1d, nj) % 360.0
    off += len(gds)

    # --- BMS ---
    bitmap: np.ndarray | None = None
    if has_bms:
        bms = buf[off : off + _u(buf, off, 3)]
        if _u(bms, 4, 2) != 0:
            raise ValueError("GRIB1 catalogued (non-inline) bitmap unsupported")
        bitmap = np.unpackbits(np.frombuffer(bms[6:], dtype=np.uint8)).astype(
            bool
        )
        off += len(bms)

    # --- BDS ---
    bds = buf[off : off + _u(buf, off, 3)]
    flags = bds[3] >> 4
    if flags & 0x8:
        raise ValueError("GRIB1 spherical-harmonic data unsupported")
    unused_bits = bds[3] & 0x0F
    e_scale = _s2(bds, 4)
    r_ref = _ibm_float(bds[6:10])
    nbits = bds[10]
    n_grid = ni * nj
    n_values = (
        int(bitmap[:n_grid].sum()) if bitmap is not None else n_grid
    )
    if flags & 0x4:
        values = _decode_second_order(
            bds,
            e_scale,
            r_ref,
            d_scale,
            n_values,
            ni=ni if bitmap is None else 0,
        )
    else:
        if nbits > 0:
            avail = (len(bds) - 11) * 8 - unused_bits
            if avail < n_values * nbits:
                raise ValueError(
                    f"GRIB1 data section too short: {avail} bits < "
                    f"{n_values * nbits}"
                )
        packed = _unpack_bits(bds[11:], n_values, nbits)
        values = (r_ref + packed * (2.0**e_scale)) / (10.0**d_scale)
    if bitmap is not None:
        full = np.full(n_grid, np.nan)
        full[bitmap[:n_grid]] = values
        values = full

    var = PARAM_NAMES_ED1.get(param, f"p{param}")
    frame = pd.DataFrame(
        {
            "time": pd.Timestamp(ref_time + lead),
            "latitude": grid_lat,
            "longitude": grid_lon,
            "variable": var,
            "value": values.astype(np.float64),
        }
    )
    return frame, end
