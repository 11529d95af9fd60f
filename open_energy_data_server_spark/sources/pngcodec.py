"""Minimal pure-Python PNG decoder for GRIB2 data template 5.41.

NCEP encodes some operational GRIB2 products with PNG packing
(data-representation template 5.41): section 7 is a complete PNG
image whose pixel samples are the scaled field values X in
``value = (R + X·2^E) / 10^D`` — grayscale for depths 1-16, RGB/RGBA
for the 24/32-bit cases, big-endian sample order (the PNG spec's
network byte order). The reference reads such files through pygrib's
libpng binding (/root/reference/crawler/dwd.py:120-147 path); this
decoder removes that native dependency for the common non-interlaced
case.

Format knowledge is the public PNG specification (RFC 2083 / ISO
15948): signature, chunk layout with CRC-32, IHDR, concatenated IDAT
zlib stream, and the five scanline filters (None/Sub/Up/Average/
Paeth). Interlaced (Adam7) images and palette color raise ValueError
— GRIB2 PNG packing never produces them.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from open_energy_data_server_spark.sources._robust import corrupt_guard

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type → sample channels per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(stream: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters; returns (height, stride) u8."""
    if len(stream) != (stride + 1) * height:
        raise ValueError(
            f"PNG pixel stream is {len(stream)} bytes, expected "
            f"{(stride + 1) * height}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        f = stream[pos]
        row = np.frombuffer(
            stream[pos + 1 : pos + 1 + stride], dtype=np.uint8
        ).copy()
        pos += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub: left neighbor — sequential along the row
            for i in range(bpp, stride):
                row[i] = (int(row[i]) + int(row[i - bpp])) & 0xFF
        elif f == 2:  # Up: vectorized (uint8 addition wraps mod 256)
            row += prev
        elif f == 3:  # Average of left and up
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif f == 4:  # Paeth predictor
            for i in range(stride):
                left = int(row[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                row[i] = (int(row[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG scanline filter {f} unknown")
        out[y] = row
        prev = row
    return out


@corrupt_guard("png")
def decode_png(raw: bytes) -> np.ndarray:
    """PNG bytes → (height, width) int64 sample matrix. Multi-channel
    pixels (GRIB2's 24/32-bit cases) combine big-endian: the first
    channel is the most significant byte group."""
    if raw[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = depth = ctype = None
    idat = bytearray()
    pos = 8
    while pos + 12 <= len(raw):
        ln = int.from_bytes(raw[pos : pos + 4], "big")
        typ = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + ln]
        if len(data) < ln:
            raise ValueError(f"PNG {typ!r} chunk truncated")
        crc = int.from_bytes(raw[pos + 8 + ln : pos + 12 + ln], "big")
        if (zlib.crc32(typ + data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG {typ!r} chunk CRC mismatch")
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0:
                raise ValueError("PNG compression/filter method not 0")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG unsupported")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    channels = _CHANNELS.get(ctype)
    if channels is None:
        raise ValueError(f"PNG color type {ctype} unsupported (no palette)")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"PNG bit depth {depth} invalid")
    if depth < 8 and channels != 1:
        raise ValueError("PNG sub-byte depth is grayscale-only")
    if width == 0 or height == 0 or width * height > 1 << 26:
        raise ValueError(f"implausible PNG dimensions {width}x{height}")
    stride = (width * channels * depth + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    rows = _unfilter(zlib.decompress(bytes(idat)), height, stride, bpp)

    if depth == 16:
        samples = rows.reshape(height, stride).view(">u2").astype(np.int64)
    elif depth == 8:
        samples = rows.astype(np.int64)
    else:  # 1/2/4-bit grayscale, big-endian within each byte
        bits = np.unpackbits(rows, axis=1)[:, : width * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.int64)
        samples = bits.reshape(height, width, depth).astype(np.int64) @ weights
        return samples
    samples = samples.reshape(height, width, channels)
    # big-endian channel combine (one shift-add per channel, ≤4)
    vals = np.zeros((height, width), dtype=np.int64)
    for c in range(channels):
        vals = (vals << depth) | samples[:, :, c]
    return vals
