"""Corrupt-input fuzzing for the pure binary decoders.

At 100 TB the landing area WILL contain truncated downloads and
bit-rotted files. A corrupt file must fail its Spark task READABLY —
a single ValueError naming the format — never an IndexError /
struct.error deep in octet math, an infinite loop, or a silent wrong
decode that crashes later. This module drives every decoder through:

- a truncation sweep (every prefix length on a sampled grid), and
- a bit-flip sweep (two flips at every sampled byte position),

asserting each decode either succeeds or raises ValueError, under a
watchdog alarm that turns a hung decoder into a test failure.
Deterministic by construction (fixed fixtures, fixed position grids —
no RNG), so failures replay exactly.
"""

from __future__ import annotations

import signal

import pytest

from open_energy_data_server_spark.sources.cfb import read_cfb, write_cfb
from open_energy_data_server_spark.sources.grib2codec import decode_grib2
from open_energy_data_server_spark.sources.j2kcodec import decode_j2k
from open_energy_data_server_spark.sources.netcdf3 import decode_netcdf3
from open_energy_data_server_spark.sources.pngcodec import decode_png
from open_energy_data_server_spark.sources.sevenzip import read_7z, write_7z
from open_energy_data_server_spark.sources.shapefile import parse_dbf, parse_shp
from open_energy_data_server_spark.sources.xls_codec import parse_xls, write_xls

from tests.test_grib1codec import make_grib1
from tests.test_grib2codec import make_grib2
from tests.test_shapefile import _dbf, _poly_content, _shp

WATCHDOG_SECONDS = 20


def _sample_positions(n: int, k: int = 120) -> list[int]:
    """k deterministic positions covering [0, n)."""
    if n <= k:
        return list(range(n))
    step = n / k
    return sorted({int(i * step) for i in range(k)})


def _drive(decode, blob: bytes) -> None:
    """One fuzz probe: decode must finish fast and fail only cleanly."""

    def _alarm(signum, frame):  # noqa: ARG001
        raise RuntimeError("decoder hung on corrupt input")

    old = signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(WATCHDOG_SECONDS)
    try:
        try:
            decode(blob)
        except ValueError:
            pass  # the one allowed failure mode
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def _fuzz(decode, raw: bytes) -> None:
    for cut in _sample_positions(len(raw)):
        _drive(decode, raw[:cut])
    for pos in _sample_positions(len(raw)):
        for mask in (0x80, 0x01):
            mutated = bytearray(raw)
            mutated[pos] ^= mask
            _drive(decode, bytes(mutated))


# --- fixtures: one healthy artifact per codec ------------------------

def _grib1_bytes() -> bytes:
    return make_grib1(
        [0, 10, 20, 35, 7, 9], ni=3, nj=2, bitmap=None, grid_type=0
    )


def _grib1_so_bytes() -> bytes:
    # second-order packing with boustrophedonic row ordering — the
    # grouped/serpentine decode path has its own pointer arithmetic
    from tests.test_grib1codec import make_so_bds

    body = make_so_bds(
        [0], [1, 2, 3, 6, 5, 4, 7, 8, 9], [0] * 9, widths=8, ext_extra=0x08
    )
    return make_grib1([], ni=3, nj=3, bds_body_override=body)


def _grib1_sh_bytes() -> bytes:
    # spherical-harmonic simple packing — separate GDS/BDS layout
    from tests.test_grib1codec import make_grib1_sh

    return make_grib1_sh(7.25, [0, 10, 20, 35, 50], trunc=1)


def _grib2_bytes() -> bytes:
    return make_grib2(list(range(12)), ni=4, nj=3)


def _sevenzip_bytes() -> bytes:
    return write_7z(
        {"a.csv": b"ts,v\n1,2\n" * 30, "b.txt": b"hello world"},
        codec="lzma2",
    )


def _xls_bytes() -> bytes:
    rows = [["name", "count"], ["alpha", 1], ["beta", 2], ["gamma", 3]]
    return write_xls({"Data": rows})


def _cfb_bytes() -> bytes:
    return write_cfb({"Workbook": b"payload" * 20, "Extra": bytes(range(256))})


def _shp_bytes() -> bytes:
    ring = [(0.0, 0.0), (0.0, 4.0), (4.0, 4.0), (4.0, 0.0), (0.0, 0.0)]
    return _shp([_poly_content([ring])] * 3, shape_type=5)


def _dbf_bytes() -> bytes:
    return _dbf(
        [("A", 1, 1.5, "T"), ("B", 2, 2.5, "F"), ("C", 3, 3.5, "T")]
    )


def _grib2_aec_bytes() -> bytes:
    import numpy as np

    from open_energy_data_server_spark.sources.aeccodec import (
        FLAG_MSB,
        FLAG_PREPROCESS,
        encode_ccsds,
    )

    xs = np.clip(
        np.cumsum(np.arange(48) % 7 - 3) + 200, 0, 1023
    ).astype(np.uint32)
    flags = FLAG_PREPROCESS | FLAG_MSB
    payload = encode_ccsds(xs, 10, flags=flags, block_size=16, rsi=8)
    return make_grib2(
        list(xs),
        ni=8,
        nj=6,
        nbits=10,
        drs_template=42,
        data_override=payload,
        sec5_extra=bytes([flags, 16]) + (8).to_bytes(2, "big"),
    )


def _png_bytes() -> bytes:
    from tests.test_pngcodec import write_png

    grid = [[(i * 37 + j * 11) % 256 for j in range(9)] for i in range(7)]
    return write_png(grid, depth=8, row_filters=[0, 1, 2, 3, 4])


def _grib2_j2k_bytes() -> bytes:
    import numpy as np

    from tests.test_j2kcodec import _j2k_grib2

    xs = np.clip(
        np.cumsum(np.arange(48) % 7 - 3) + 200, 0, 1023
    ).astype(np.int64)
    return _j2k_grib2(xs, 8, 6, nbits=10, levels=2)


def _j2k_bytes() -> bytes:
    import numpy as np

    from open_energy_data_server_spark.sources.j2kcodec import encode_j2k

    rng = np.random.default_rng(5)
    return encode_j2k(
        rng.integers(0, 4096, size=(11, 9), dtype=np.int64), 12, 2, (8, 8)
    )


def _j2k_lossy_bytes() -> bytes:
    import numpy as np

    from open_energy_data_server_spark.sources.j2kcodec import encode_j2k

    rng = np.random.default_rng(29)
    return encode_j2k(
        rng.integers(0, 2048, size=(11, 9), dtype=np.int64), 11, 2, (8, 8),
        irreversible=True, quant_style="expounded", mantissa=300,
    )


def _j2k_lossy_derived_bytes() -> bytes:
    import numpy as np

    from open_energy_data_server_spark.sources.j2kcodec import encode_j2k

    rng = np.random.default_rng(31)
    return encode_j2k(
        rng.integers(0, 2048, size=(9, 13), dtype=np.int64), 11, 2, (8, 8),
        irreversible=True, quant_style="derived",
    )


def _j2k_multilayer_bytes() -> bytes:
    import numpy as np

    from open_energy_data_server_spark.sources.j2kcodec import encode_j2k

    rng = np.random.default_rng(37)
    return encode_j2k(
        rng.integers(0, 1024, size=(13, 10), dtype=np.int64), 10, 2, (8, 8),
        layers=3, progression="rlcp",
    )


def _j2k_multitile_bytes() -> bytes:
    import numpy as np

    from open_energy_data_server_spark.sources.j2kcodec import encode_j2k

    rng = np.random.default_rng(41)
    return encode_j2k(
        rng.integers(0, 1024, size=(14, 22), dtype=np.int64), 10, 1, (8, 8),
        tile_size=(10, 10), tile_parts=2,
    )


def _j2k_precinct_bytes() -> bytes:
    import numpy as np

    from open_energy_data_server_spark.sources.j2kcodec import encode_j2k

    rng = np.random.default_rng(43)
    return encode_j2k(
        rng.integers(0, 1024, size=(18, 26), dtype=np.int64), 10, 2, (8, 8),
        precincts=(4, 4), sop=True, eph=True, layers=2,
        poc=[(0, 1, 3, "rpcl"), (0, 2, 3, "lrcp")],
    )


def _grib2_spectral_bytes() -> bytes:
    from tests.test_grib2_spectral import make_grib2_spectral

    return make_grib2_spectral(
        unpacked=[5.5, 0.0],
        packed_x=[2, 4, 12, 18, 4, 6, 30, 36, 12, 24],
        trunc=2,
        js=0,
    )


def _netcdf_bytes() -> bytes:
    from tests.test_netcdf3 import make_weather_file

    return make_weather_file()


CODECS = {
    "grib1": (_grib1_bytes, decode_grib2),
    "grib1_so": (_grib1_so_bytes, decode_grib2),
    "grib1_sh": (_grib1_sh_bytes, decode_grib2),
    "grib2_j2k": (_grib2_j2k_bytes, decode_grib2),
    "grib2_spectral": (_grib2_spectral_bytes, decode_grib2),
    "j2k": (_j2k_bytes, decode_j2k),
    "j2k_lossy": (_j2k_lossy_bytes, decode_j2k),
    "j2k_multilayer": (_j2k_multilayer_bytes, decode_j2k),
    "j2k_multitile": (_j2k_multitile_bytes, decode_j2k),
    "j2k_precinct": (_j2k_precinct_bytes, decode_j2k),
    "j2k_lossy_derived": (_j2k_lossy_derived_bytes, decode_j2k),
    "png": (_png_bytes, decode_png),
    "grib2": (_grib2_bytes, decode_grib2),
    "grib2_aec": (_grib2_aec_bytes, decode_grib2),
    "sevenzip": (_sevenzip_bytes, read_7z),
    "xls": (_xls_bytes, parse_xls),
    "cfb": (_cfb_bytes, read_cfb),
    "shp": (_shp_bytes, parse_shp),
    "dbf": (_dbf_bytes, parse_dbf),
    "netcdf": (_netcdf_bytes, decode_netcdf3),
}


@pytest.mark.parametrize("name", sorted(CODECS))
def test_codec_truncation_and_bitflip_fuzz(name):
    build, decode = CODECS[name]
    raw = build()
    decode(raw)  # healthy fixture must decode
    _fuzz(decode, raw)


def test_gdbtable_fuzz(tmp_path):
    """GdbTable reads path pairs — fuzz the .gdbtable bytes against a
    healthy .gdbtablx and vice versa."""
    from open_energy_data_server_spark.sources.gdbtable import GdbTable
    from tests.test_gdbtable import SQUARE, write_fixture_gdb

    good = tmp_path / "good"
    good.mkdir()
    write_fixture_gdb(
        good,
        [(1, 1.5, "a", SQUARE), (2, None, "b", None), (3, 2.5, None, SQUARE)],
    )
    table_raw = (good / "a00000004.gdbtable").read_bytes()
    tablx_raw = (good / "a00000004.gdbtablx").read_bytes()

    work = tmp_path / "work"
    work.mkdir()

    def decode_pair(table: bytes, tablx: bytes) -> None:
        (work / "a00000004.gdbtable").write_bytes(table)
        (work / "a00000004.gdbtablx").write_bytes(tablx)
        t = GdbTable(str(work / "a00000004.gdbtable"))
        t.read_rows(0, 10)

    decode_pair(table_raw, tablx_raw)  # healthy pair must decode
    _fuzz(lambda b: decode_pair(b, tablx_raw), table_raw)
    _fuzz(lambda b: decode_pair(table_raw, b), tablx_raw)
