"""Pure-Python GRIB2 decoder (WMO FM 92 GRIB Edition 2, public spec).

Replaces the raise-only stub default in ``sources.grib`` with a real
codec so the ECMWF/DWD weather path decodes without cfgrib/pygrib
(/root/reference/crawler/ecmwf.py:135-141, crawler/dwd.py:120-147 use
those C libraries; neither ships in this container). Scope is the
subset those crawlers actually produce/consume:

- Section 3 grid templates 3.0 (regular latitude/longitude — the
  ECMWF open-data and DWD ICON-EU regular grids) and 3.40 Gaussian —
  the native IFS grid, REGULAR and REDUCED (per-row point counts via
  the optional grid-definition list; ragged rows melt naturally into
  the long output); row latitudes from Gauss-Legendre quadrature
  nodes, subarea rows selected nearest La1 — and 3.50 (spherical
  harmonic coefficients, triangular truncation J=K=M: the IFS
  upper-air native representation).
- Section 5 data representation templates 5.0 (simple packing:
  ``value = (R + X · 2^E) / 10^D`` with X an unsigned big-endian
  bit-field of ``nbits`` per point), 5.2 (complex packing: group
  references + per-group widths/lengths), and 5.3 (complex packing
  with first/second-order spatial differencing — the NCEP operational
  encoding), 5.40 (lossless JPEG2000 packing — the ECMWF open-data
  encoding; decoded by the sibling pure ``sources.j2kcodec``, no
  openjpeg/jasper), 5.41 (PNG packing — the data section is a PNG
  image whose samples are the scaled values; decoded by the sibling
  pure ``sources.pngcodec``, no libpng), and 5.42 (CCSDS/AEC lossless
  packing — the current DWD open-data encoding; decoded by the
  sibling pure ``sources.aeccodec``, no libaec), and 5.51 (spectral
  data, complex packing: the low-wavenumber sub-pentagon stored as
  raw IEEE floats, the rest simple-packed after multiplication by the
  Laplacian operator ``(n(n+1))^p`` — decode divides it back out).
  Spectral messages have no geometry, so the long frame carries the
  coefficient's (total, zonal) wavenumber pair in the two geometry
  columns and tags the variable ``*_sh_re`` / ``*_sh_im`` — lossless,
  self-describing, and the same row shape cfgrib exposes as an
  abstract coefficient dimension.
- Section 6 bitmap indicator 0 (bitmap present) and 255 (none).
- Multi-message files (each hour/variable is its own GRIB message,
  concatenated — the DWD download shape).

Decoding is numpy-vectorized (the bit unpack is one ``unpackbits`` +
matmul, no per-point Python), so a 824×848 grid (dwd.py:189) decodes
in milliseconds inside the executor's Arrow batch.

GRIB edition 1 messages (the DWD COSMO REA6 shape, dwd.py:120-147)
dispatch to the sibling pure codec ``sources.grib1codec`` — mixed-
edition files decode transparently. Deliberately NOT implemented
(raise ValueError, callers inject cfgrib via the ``decoder=`` seam
instead): pentagonal (non-triangular) spectral truncations, lossy
JPEG2000, embedded missing-value management in complex packing,
Lambert/polar projections.
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from open_energy_data_server_spark.sources._robust import corrupt_guard

# (discipline, parameterCategory, parameterNumber) → short name, for the
# variables the reference's weather crawlers request (dwd.py:33-44,
# ecmwf.py:56-66); unknown triples fall back to a systematic code.
PARAM_NAMES = {
    (0, 0, 0): "t",  # temperature (K)
    (0, 1, 8): "tp",  # total precipitation
    (0, 2, 2): "u",  # u-component of wind
    (0, 2, 3): "v",  # v-component of wind
    (0, 4, 7): "ssrd",  # downward short-wave radiation flux (surface)
    (0, 4, 9): "nswrf",  # net short-wave radiation flux (surface)
    (0, 6, 1): "tcc",  # total cloud cover
    (2, 0, 2): "stl1",  # soil temperature
}

# forecast-time unit (code table 4.4) → timedelta of one unit
_TIME_UNIT = {
    0: timedelta(minutes=1),
    1: timedelta(hours=1),
    2: timedelta(days=1),
    10: timedelta(hours=3),
    11: timedelta(hours=6),
    12: timedelta(hours=12),
    13: timedelta(seconds=1),
}


def _sign_magnitude(raw: int, bits: int) -> int:
    """GRIB2 signed ints are sign-magnitude: the high bit is the sign."""
    sign_bit = 1 << (bits - 1)
    if raw & sign_bit:
        return -(raw & (sign_bit - 1))
    return raw


def _u(b: bytes, off: int, n: int) -> int:
    return int.from_bytes(b[off : off + n], "big")


def _s(b: bytes, off: int, n: int) -> int:
    return _sign_magnitude(_u(b, off, n), 8 * n)


def _unpack_bits(data: bytes, n_values: int, nbits: int) -> np.ndarray:
    """Unpack ``n_values`` big-endian unsigned ``nbits``-wide fields."""
    if nbits == 0:
        return np.zeros(n_values, dtype=np.float64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    need = n_values * nbits
    if bits.size < need:
        raise ValueError(f"GRIB2 data section too short: {bits.size} bits < {need}")
    weights = (1 << np.arange(nbits - 1, -1, -1)).astype(np.float64)
    return bits[:need].reshape(n_values, nbits).astype(np.float64) @ weights


def _spectral_wavenumbers(trunc: int) -> tuple[np.ndarray, np.ndarray]:
    """(total n, zonal m) per complex coefficient of a triangular-T
    spectral field in GRIB storage order: m varies slowest, n = m..T
    within each m (the ecCodes/IFS layout)."""
    ms = np.repeat(np.arange(trunc + 1), trunc + 1 - np.arange(trunc + 1))
    ns = np.concatenate([np.arange(m, trunc + 1) for m in range(trunc + 1)])
    return ns, ms


def _unpack_spectral(
    data: bytes,
    n_points: int,
    nbits: int,
    meta: dict,
    trunc: int,
    r_ref: float,
    e_scale: int,
    d_scale: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Section-7 payload for template 7.51 (spectral data — complex
    packing): the sub-truncation Ts values arrive first as raw IEEE
    floats (code table 5.7 precision), the remaining coefficients
    simple-packed and pre-multiplied by the Laplacian operator
    ``(n(n+1))^p`` (p signed, stored ×10⁻⁶) — decode divides it back
    out. Returns (values, n, m) in stream order, two rows (re, im)
    per complex coefficient."""
    ns, ms = _spectral_wavenumbers(trunc)
    n_coeff = ns.size
    if n_points != 2 * n_coeff:
        raise ValueError(
            f"spectral field T{trunc} needs {2 * n_coeff} values, "
            f"DRS says {n_points}"
        )
    sub = ns <= meta["js"]
    ts = meta["ts"]
    if ts != 2 * int(sub.sum()):
        raise ValueError(
            f"unpacked-subset count {ts} inconsistent with sub-truncation "
            f"T{meta['js']} ({2 * int(sub.sum())} values)"
        )
    if ts < 2:
        raise ValueError("spectral subset must include the (0,0) coefficient")
    width, dt = {1: (4, ">f4"), 2: (8, ">f8")}.get(meta["precision"], (0, ""))
    if not width:
        raise ValueError(
            f"unpacked-subset precision {meta['precision']} unsupported "
            "(1 = IEEE 32-bit, 2 = 64-bit)"
        )
    if len(data) < ts * width:
        raise ValueError("spectral data section shorter than unpacked subset")
    raw = np.frombuffer(data, dtype=dt, count=ts, offset=0).astype(np.float64)
    packed = _unpack_bits(data[ts * width :], n_points - ts, nbits)
    y = (r_ref + packed * (2.0**e_scale)) / (10.0**d_scale)
    n_pk = ns[~sub].astype(np.float64)
    lam = (n_pk * (n_pk + 1.0)) ** meta["p"]
    values = np.empty(n_points, dtype=np.float64)
    mask2 = np.repeat(sub, 2)
    values[mask2] = raw
    values[~mask2] = y / np.repeat(lam, 2)
    return values, np.repeat(ns, 2), np.repeat(ms, 2)


def _gaussian_latitudes(
    n: int, lat1: float, nj: int, north_to_south: bool
) -> np.ndarray:
    """Row latitudes of a regular Gaussian grid of number N: the 2N
    Gauss-Legendre quadrature nodes mapped through arcsin (the grid
    ECMWF's IFS runs on). A subarea takes the ``nj`` consecutive
    Gaussian rows starting at the one nearest La1, in scan order."""
    if n > 1 << 14:  # leggauss is O(N²); operational grids are ≤ O2560
        raise ValueError(f"implausible Gaussian grid number N={n}")
    nodes, _ = np.polynomial.legendre.leggauss(2 * n)
    glats = np.degrees(np.arcsin(np.sort(nodes)))  # ascending
    if north_to_south:
        glats = glats[::-1]
    start = int(np.argmin(np.abs(glats - lat1)))
    if start + nj > glats.size:
        raise ValueError(
            f"Gaussian grid N={n}: {nj} rows from La1={lat1} overrun the "
            f"{glats.size} quadrature latitudes"
        )
    return glats[start : start + nj]


def _parse_complex_drs(body: bytes, template: int) -> dict:
    """Section-5 fields shared by templates 5.2 (complex packing) and
    5.3 (complex packing with spatial differencing), per the WMO
    template tables. Missing-value management (octet 23) beyond
    'none' stays unsupported — rare outside ocean masks, and those
    files carry a section-6 bitmap instead."""
    if body[22] != 0:
        raise ValueError(
            "GRIB2 complex packing with embedded missing-value management "
            f"({body[22]}) unsupported; inject a cfgrib decoder"
        )
    meta = {
        "split_method": body[21],
        "ng": _u(body, 31, 4),
        "width_ref": body[35],
        "width_bits": body[36],
        "len_ref": _u(body, 37, 4),
        "len_inc": body[41],
        "len_last": _u(body, 42, 4),
        "len_bits": body[46],
        "order": 0,
        "extra_octets": 0,
    }
    if template == 3:
        meta["order"] = body[47]
        meta["extra_octets"] = body[48]
        if meta["order"] not in (1, 2):
            raise ValueError(
                f"spatial differencing order {meta['order']} unsupported (1 or 2)"
            )
    return meta


def _unpack_fields(bits: np.ndarray, pos: int, n: int, width: int) -> tuple[np.ndarray, int]:
    """n consecutive big-endian unsigned fields of ``width`` bits from
    a pre-unpacked bit array; returns (values, new bit position)."""
    if width == 0:
        return np.zeros(n, dtype=np.int64), pos
    need = n * width
    if pos + need > bits.size:
        raise ValueError("GRIB2 complex data section too short")
    weights = (1 << np.arange(width - 1, -1, -1)).astype(np.int64)
    vals = bits[pos : pos + need].reshape(n, width).astype(np.int64) @ weights
    return vals, pos + need


def _unpack_complex(data: bytes, n_points: int, nbits: int, meta: dict) -> np.ndarray:
    """Section-7 payload for templates 7.2/7.3: group reference values,
    group widths, scaled group lengths (each array padded to a byte
    boundary), then each group's deltas at its own width. 7.3 prepends
    the first value(s) and the overall minimum of the differenced
    stream (sign-magnitude, ``extra_octets`` wide), and the decoded
    stream is un-differenced at the declared order."""
    order, extra = meta["order"], meta["extra_octets"]
    off = 0
    ivals: list[int] = []
    gmin = 0
    if order:
        if extra == 0:
            raise ValueError("GRIB2 template 5.3 with zero extra octets")
        for _ in range(order):
            ivals.append(_sign_magnitude(_u(data, off, extra), 8 * extra))
            off += extra
        gmin = _sign_magnitude(_u(data, off, extra), 8 * extra)
        off += extra
    bits = np.unpackbits(np.frombuffer(data[off:], dtype=np.uint8))
    ng = meta["ng"]
    pos = 0
    refs, pos = _unpack_fields(bits, pos, ng, nbits)
    pos = (pos + 7) & ~7  # arrays pad to byte boundaries
    widths, pos = _unpack_fields(bits, pos, ng, meta["width_bits"])
    widths = widths + meta["width_ref"]
    pos = (pos + 7) & ~7
    lens, pos = _unpack_fields(bits, pos, ng, meta["len_bits"])
    lens = lens * meta["len_inc"] + meta["len_ref"]
    if ng:
        lens[-1] = meta["len_last"]
    pos = (pos + 7) & ~7
    if int(lens.sum()) != n_points:
        raise ValueError(
            f"GRIB2 group lengths sum to {int(lens.sum())}, expected {n_points}"
        )
    out = np.empty(n_points, dtype=np.int64)
    at = 0
    for g in range(ng):
        n, w = int(lens[g]), int(widths[g])
        if w == 0:
            out[at : at + n] = refs[g]
        else:
            vals, pos = _unpack_fields(bits, pos, n, w)
            out[at : at + n] = vals + refs[g]
        at += n
    if order:
        out += gmin
        out[:order] = ivals
        if order == 1:
            out = np.cumsum(out)
        else:  # order 2: x[i] = d[i] + 2x[i-1] - x[i-2]
            for i in range(2, n_points):
                out[i] += 2 * out[i - 1] - out[i - 2]
    return out.astype(np.float64)


def _decode_message(buf: bytes, start: int) -> tuple[pd.DataFrame, int]:
    """Decode one GRIB2 message starting at ``start``; return
    (long-frame, offset-after-message)."""
    if buf[start : start + 4] != b"GRIB":
        raise ValueError(f"not a GRIB message at offset {start}")
    discipline = buf[start + 6]
    edition = buf[start + 7]
    if edition != 2:
        raise ValueError(f"GRIB edition {edition} unsupported (only 2)")
    total_len = _u(buf, start + 8, 8)
    end = start + total_len
    if buf[end - 4 : end] != b"7777":
        raise ValueError("GRIB message missing 7777 trailer")

    off = start + 16
    ref_time: datetime | None = None
    lead: timedelta = timedelta(0)
    category = number = None
    ni = nj = None
    lat1 = lon1 = dlat = dlon = None
    scan_neg_j = True
    r_ref = 0.0
    drs_template = 0
    complex_meta: dict | None = None
    aec_meta: dict | None = None
    gauss_n = 0
    row_ni: np.ndarray | None = None
    spectral_trunc: int | None = None
    sh_meta: dict | None = None
    e_scale = d_scale = 0
    nbits = 0
    n_points = 0
    bitmap: np.ndarray | None = None
    frames: list[pd.DataFrame] = []

    while off < end - 4:
        sec_len = _u(buf, off, 4)
        if sec_len < 5:
            raise ValueError(
                f"GRIB2 section at offset {off} has length {sec_len} (< 5 "
                "header bytes) — corrupt message"
            )
        sec_num = buf[off + 4]
        body = buf[off : off + sec_len]
        if sec_num == 1:
            year = _u(body, 12, 2)
            ref_time = datetime(
                year, body[14], body[15], body[16], body[17], body[18]
            )
        elif sec_num == 3:
            template = _u(body, 12, 2)
            if template not in (0, 40, 50):
                raise ValueError(
                    f"grid template 3.{template} unsupported (3.0 latlon / "
                    "3.40 Gaussian / 3.50 spherical harmonics)"
                )
            if template == 50:
                # spherical harmonic coefficients: pentagonal resolution
                # parameters J, K, M — only the triangular truncation the
                # IFS emits (J=K=M) is supported
                j_res = _u(body, 14, 4)
                k_res = _u(body, 18, 4)
                m_res = _u(body, 22, 4)
                if not (j_res == k_res == m_res):
                    raise ValueError(
                        f"pentagonal spectral truncation J={j_res} K={k_res} "
                        f"M={m_res} unsupported (triangular only); inject "
                        "cfgrib"
                    )
                if j_res > 1 << 12:  # T4096 ≫ any operational truncation
                    raise ValueError(
                        f"implausible spectral truncation T{j_res}"
                    )
                spectral_trunc = j_res
                ni = nj = 0  # spectral fields carry no grid
                off += sec_len
                continue
            ni = _u(body, 30, 4)
            nj = _u(body, 34, 4)
            # a corrupt 4-byte count can claim a multi-billion-point
            # grid and OOM the executor on the lat/lon allocation —
            # far beyond any operational field (global 0.05° ≈ 26M).
            # Ni is legitimately coded missing (all-ones) on reduced
            # Gaussian grids, where the per-row list bounds the points.
            if nj > 1 << 26 or (body[10] == 0 and ni * nj > 1 << 26):
                raise ValueError(
                    f"implausible GRIB2 grid {ni}x{nj} (> 2^26 points)"
                )
            # REDUCED Gaussian (ECMWF's native O-grid): an optional
            # list (octet 11 = entry width, octet 12 = interpretation 1
            # "points per row") follows the template body at octet 73;
            # Ni itself is coded missing. Rows are ragged — which the
            # melted (lat, lon, value) output absorbs naturally.
            if body[10] != 0:
                if template != 40 or body[11] != 1:
                    raise ValueError(
                        "optional grid-definition list only supported as "
                        "points-per-row on Gaussian grids; inject cfgrib"
                    )
                w = body[10]
                row_ni = np.array(
                    [_u(body, 72 + k * w, w) for k in range(nj)], dtype=np.int64
                )
                if int(row_ni.sum()) > 1 << 26:
                    raise ValueError(
                        "implausible reduced-grid points-per-row total "
                        f"{int(row_ni.sum())} (> 2^26)"
                    )
            lat1 = _s(body, 46, 4) / 1e6
            lon1 = _u(body, 50, 4) / 1e6
            dlon = _u(body, 63, 4) / 1e6
            # 3.40 reinterprets octets 68-71 as N (parallels between a
            # pole and the equator); the row latitudes become the 2N
            # Gaussian quadrature latitudes instead of a fixed step
            gauss_n = _u(body, 67, 4) if template == 40 else 0
            dlat = 0.0 if template == 40 else _u(body, 67, 4) / 1e6
            scan = body[71]
            # scanning-mode flags (table 3.4): bit 1 → −i, bit 2 → +j
            if scan & 0x80:
                dlon = -dlon
            scan_neg_j = not (scan & 0x40)
        elif sec_num == 4:
            category = body[9]
            number = body[10]
            template = _u(body, 7, 2)
            if template in (0, 8) and len(body) >= 23:
                unit = _TIME_UNIT.get(body[17])
                if unit is not None:
                    lead = _u(body, 18, 4) * unit
        elif sec_num == 5:
            n_points = _u(body, 5, 4)
            template = _u(body, 9, 2)
            if template not in (0, 2, 3, 40, 41, 42, 51):
                raise ValueError(
                    f"data representation template 5.{template} unsupported (only "
                    "5.0 simple / 5.2 complex / 5.3 complex+spatial-diff / "
                    "5.40 JPEG2000 / 5.41 PNG / 5.42 CCSDS / 5.51 spectral); "
                    "inject a cfgrib decoder for this file"
                )
            drs_template = template
            r_ref = struct.unpack(">f", body[11:15])[0]
            e_scale = _sign_magnitude(_u(body, 15, 2), 16)
            d_scale = _sign_magnitude(_u(body, 17, 2), 16)
            nbits = body[19]
            if template in (2, 3):
                complex_meta = _parse_complex_drs(body, template)
            elif template == 40:
                # octet 22: compression type (0 lossless / 1 lossy) —
                # both decode through sources.j2kcodec (the lossy path
                # carries the 9/7 transform + scalar quantization in
                # the codestream's own COD/QCD markers, so no extra
                # metadata is needed here)
                if len(body) >= 22 and body[21] not in (0, 1, 255):
                    raise ValueError(
                        f"GRIB2 template 5.40 compression type {body[21]} "
                        "unknown (0 lossless / 1 lossy)"
                    )
            elif template == 42:
                if len(body) < 25:
                    raise ValueError("GRIB2 template 5.42 section too short")
                aec_meta = {
                    "flags": body[21],
                    "block_size": body[22],
                    "rsi": _u(body, 23, 2),
                }
            elif template == 51:
                if len(body) < 35:
                    raise ValueError("GRIB2 template 5.51 section too short")
                js, ks, ms_ = _u(body, 24, 2), _u(body, 26, 2), _u(body, 28, 2)
                if not (js == ks == ms_):
                    raise ValueError(
                        f"pentagonal spectral sub-truncation Js={js} Ks={ks} "
                        f"Ms={ms_} unsupported (triangular only); inject cfgrib"
                    )
                sh_meta = {
                    # Laplacian scaling factor, signed, stored ×10⁻⁶
                    "p": _sign_magnitude(_u(body, 20, 4), 32) / 1e6,
                    "js": js,
                    "ts": _u(body, 30, 4),
                    "precision": body[34],
                }
        elif sec_num == 6:
            indicator = body[5]
            if indicator == 0:
                bitmap = np.unpackbits(
                    np.frombuffer(body[6:], dtype=np.uint8)
                ).astype(bool)
            elif indicator != 255:
                raise ValueError(f"bitmap indicator {indicator} unsupported")
        elif sec_num == 7:
            if ni is None or ref_time is None:
                raise ValueError("GRIB2 data section before grid/identification")
            if drs_template == 51:
                if spectral_trunc is None or sh_meta is None:
                    raise ValueError(
                        "GRIB2 spectral data (5.51) requires grid template "
                        "3.50 and its DRS metadata"
                    )
                if bitmap is not None:
                    raise ValueError("bitmap with spectral data is invalid")
                sh_vals, sh_n, sh_m = _unpack_spectral(
                    bytes(body[5:]),
                    n_points,
                    nbits,
                    sh_meta,
                    spectral_trunc,
                    r_ref,
                    e_scale,
                    d_scale,
                )
                var = PARAM_NAMES.get(
                    (discipline, category, number),
                    f"d{discipline}c{category}n{number}",
                )
                part = np.tile([f"{var}_sh_re", f"{var}_sh_im"], sh_n.size // 2)
                frames.append(
                    pd.DataFrame(
                        {
                            "time": pd.Timestamp(ref_time + lead),
                            # spectral space has no geometry: the two
                            # geometry columns carry the coefficient's
                            # (total, zonal) wavenumber pair
                            "latitude": sh_n.astype(np.float64),
                            "longitude": sh_m.astype(np.float64),
                            "variable": part,
                            "value": sh_vals,
                        }
                    )
                )
                off += sec_len
                continue
            if spectral_trunc is not None or lat1 is None:
                # grid-packed data section but the grid definition was
                # spectral (or never parsed) — corrupt message
                raise ValueError(
                    "GRIB2 grid-packed data section without a grid "
                    "definition (section 3 was spectral or missing)"
                )
            if drs_template in (2, 3):
                packed = _unpack_complex(body[5:], n_points, nbits, complex_meta)
            elif drs_template == 42:
                from open_energy_data_server_spark.sources.aeccodec import (
                    decode_ccsds,
                )

                packed = decode_ccsds(
                    bytes(body[5:]),
                    n_points,
                    nbits,
                    aec_meta["flags"],
                    aec_meta["block_size"],
                    aec_meta["rsi"],
                ).astype(np.float64)
            elif drs_template == 40:
                # template 7.40: the data section IS a JPEG2000
                # codestream whose samples are the scaled values
                from open_energy_data_server_spark.sources.j2kcodec import (
                    decode_j2k,
                )

                packed = decode_j2k(bytes(body[5:])).reshape(-1).astype(
                    np.float64
                )
                if packed.size != n_points:
                    raise ValueError(
                        f"JPEG2000-packed field carries {packed.size} "
                        f"samples, DRS says {n_points}"
                    )
            elif drs_template == 41:
                # template 7.41: the data section IS a PNG image whose
                # samples are the scaled values, row-major
                from open_energy_data_server_spark.sources.pngcodec import (
                    decode_png,
                )

                packed = decode_png(bytes(body[5:])).reshape(-1).astype(
                    np.float64
                )
                if packed.size != n_points:
                    raise ValueError(
                        f"PNG-packed field carries {packed.size} samples, "
                        f"DRS says {n_points}"
                    )
            else:
                packed = _unpack_bits(body[5:], n_points, nbits)
            values = (r_ref + packed * (2.0**e_scale)) / (10.0**d_scale)
            n_grid = int(row_ni.sum()) if row_ni is not None else ni * nj
            # validate counts BEFORE the O(n_grid) lat/lon allocations:
            # a corrupt ni/nj claiming millions of points must fail on
            # this comparison, not after materializing the grid
            if bitmap is not None:
                if bitmap[:n_grid].sum() != values.size:
                    raise ValueError(
                        f"{values.size} values for "
                        f"{int(bitmap[:n_grid].sum())} bitmap-present points"
                    )
            elif values.size != n_grid:
                raise ValueError(f"{values.size} values for {n_grid} grid points")
            if gauss_n:
                row_lats = _gaussian_latitudes(gauss_n, lat1, nj, scan_neg_j)
            else:
                row_lats = lat1 + (-dlat if scan_neg_j else dlat) * np.arange(nj)
            if row_ni is not None:
                # ragged rows: each circle holds Ni(j) evenly spaced
                # points starting at Lo1 (the global O-grid layout)
                grid_lat = np.repeat(row_lats, row_ni)
                grid_lon = np.concatenate(
                    [
                        (lon1 + np.arange(k) * (360.0 / k)) % 360.0
                        for k in row_ni
                    ]
                )
            else:
                grid_lat = np.repeat(row_lats, ni)
                grid_lon = np.tile((lon1 + dlon * np.arange(ni)) % 360.0, nj)
            if bitmap is not None:
                full = np.full(n_grid, np.nan)
                full[bitmap[:n_grid]] = values
                values = full
            var = PARAM_NAMES.get(
                (discipline, category, number),
                f"d{discipline}c{category}n{number}",
            )
            frames.append(
                pd.DataFrame(
                    {
                        "time": pd.Timestamp(ref_time + lead),
                        # i varies fastest (scan-mode row-major)
                        "latitude": grid_lat,
                        "longitude": grid_lon,
                        "variable": var,
                        "value": values,
                    }
                )
            )
            bitmap = None  # bitmap applies to the section-7 it precedes
        off += sec_len

    if not frames:
        raise ValueError("GRIB2 message contained no data section")
    return pd.concat(frames, ignore_index=True), end


@corrupt_guard("grib")
def decode_grib2(raw: bytes) -> pd.DataFrame:
    """bytes of a (possibly multi-message, possibly mixed-edition)
    GRIB file → long frame (time, latitude, longitude, variable,
    value). Edition is dispatched per message: 2 decodes here,
    1 via ``sources.grib1codec`` (the DWD COSMO REA6 path)."""
    frames = []
    off = 0
    # tolerate index/padding bytes between messages (DWD files carry them)
    while True:
        pos = raw.find(b"GRIB", off)
        if pos < 0:
            break
        if pos + 8 <= len(raw) and raw[pos + 7] == 1:
            from open_energy_data_server_spark.sources.grib1codec import (
                _decode_message1,
            )

            frame, off = _decode_message1(raw, pos)
        else:
            frame, off = _decode_message(raw, pos)
        frames.append(frame)
    if not frames:
        raise ValueError("no GRIB messages found")
    out = pd.concat(frames, ignore_index=True)
    out["value"] = out["value"].astype(np.float64)
    return out
