"""Pure-Python PNG decoder tests (GRIB2 template 5.41 support).

The fixture encoder below is test-side and independent (filters
computed forward from the RFC 2083 definitions), so the decoder is
verified against the public format, not itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from open_energy_data_server_spark.sources.pngcodec import decode_png

_SIG = b"\x89PNG\r\n\x1a\n"
_CTYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def write_png(
    vals: list[list[int]],
    depth: int = 8,
    channels: int = 1,
    row_filters: list[int] | None = None,
) -> bytes:
    """Test-side PNG encoder: combined big-endian samples → PNG with a
    chosen filter per scanline (cycled from ``row_filters``)."""
    h, w = len(vals), len(vals[0])
    maxch = (1 << depth) - 1
    rows = []
    for r in vals:
        if depth >= 8:
            bs = bytearray()
            for v in r:
                for c in range(channels - 1, -1, -1):
                    bs += ((v >> (depth * c)) & maxch).to_bytes(depth // 8, "big")
            rows.append(bytes(bs))
        else:
            bitstr = "".join(format(v, f"0{depth}b") for v in r)
            bitstr += "0" * (-len(bitstr) % 8)
            rows.append(
                bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))
            )
    stride = len(rows[0])
    bpp = max(1, depth * channels // 8)
    prev = bytes(stride)
    out = bytearray()
    for y, row in enumerate(rows):
        f = row_filters[y % len(row_filters)] if row_filters else 0
        enc = bytearray([f])
        for i in range(stride):
            left = row[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            pred = (0, left, up, (left + up) // 2, _paeth(left, up, ul))[f]
            enc.append((row[i] - pred) & 0xFF)
        out += enc
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, _CTYPE[channels], 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


GRID = [
    [0, 7, 255, 128, 3],
    [9, 9, 9, 9, 9],
    [250, 1, 128, 64, 200],
    [13, 255, 0, 77, 31],
]


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_roundtrip_each_filter(filters):
    got = decode_png(write_png(GRID, depth=8, row_filters=filters))
    assert got.tolist() == GRID


def test_depth16_grayscale():
    grid = [[0, 65535, 1234], [40000, 7, 300]]
    got = decode_png(write_png(grid, depth=16, row_filters=[4, 2]))
    assert got.tolist() == grid


def test_depth4_subbyte():
    grid = [[0, 15, 7, 3, 9], [1, 2, 3, 4, 5]]
    got = decode_png(write_png(grid, depth=4))
    assert got.tolist() == grid


def test_rgb24_channel_combine():
    # 24-bit samples as RGB: first channel is the most significant byte
    grid = [[0x010203, 0xFFFFFF, 0x000000], [0xABCDEF, 0x123456, 0x789A00]]
    got = decode_png(write_png(grid, depth=8, channels=3, row_filters=[1, 4]))
    assert got.tolist() == grid


def test_corrupt_png_raises_cleanly():
    raw = write_png(GRID)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"NOPE" + raw[4:])
    # flip a payload byte inside IDAT → CRC mismatch
    mutated = bytearray(raw)
    mutated[len(_SIG) + 25 + 20] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(mutated))
    # interlaced header rejected
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    bad = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\0\0\0"))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bad)


def test_grib2_png_template_matches_simple_packing():
    """End-to-end: a GRIB2 message using DRS 5.41 whose section 7 is a
    PNG of the X field decodes to exactly the simple-packing values."""
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2
    from tests.test_grib2codec import make_grib2

    xs = [0, 10, 20, 35, 128, 255]
    simple = decode_grib2(make_grib2(xs, ni=3, nj=2, nbits=8))
    png = write_png([xs[0:3], xs[3:6]], depth=8, row_filters=[2, 4])
    vals = decode_grib2(
        make_grib2(xs, ni=3, nj=2, nbits=8, drs_template=41, data_override=png)
    )
    assert vals["value"].tolist() == simple["value"].tolist()
    # 16-bit depth path: value = (250 + X·2)/10 hand-computed
    xs16 = [1000, 40000, 65535, 0]
    png16 = write_png([xs16[:2], xs16[2:]], depth=16, row_filters=[1])
    out = decode_grib2(
        make_grib2(xs16, ni=2, nj=2, nbits=16, drs_template=41, data_override=png16)
    )
    assert out["value"].tolist() == [
        (250.0 + x * 2.0) / 10.0 for x in xs16
    ]
    # sample-count mismatch is a clean error
    bad = write_png([[1, 2, 3]], depth=8)
    with pytest.raises(ValueError, match="samples"):
        decode_grib2(
            make_grib2([1], ni=1, nj=1, nbits=8, drs_template=41, data_override=bad)
        )


def test_png_values_are_int64_not_float():
    got = decode_png(write_png([[65535, 0]], depth=16))
    assert got.dtype == np.int64
