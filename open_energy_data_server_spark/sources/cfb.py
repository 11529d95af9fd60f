"""Compound File Binary (OLE2) container codec — the outer format of
legacy ``.xls`` workbooks (SURVEY S5).

Implements the public MS-CFB specification subset a BIFF workbook
needs: version-3 (512-byte sector) files, header-resident DIFAT (109
FAT sectors ≈ 55 MB — far beyond any crawler workbook), FAT chains,
the directory tree, and the mini-FAT/mini-stream for streams under the
4096-byte cutoff. A writer for the same subset exists so the .xls
reader is tested against independently constructed containers (the
same offline-test strategy as the 7z/xlsx/GRIB codecs).
"""

from __future__ import annotations

import struct

from open_energy_data_server_spark.sources._robust import corrupt_guard

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREE = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_MINI_CUTOFF = 4096


class CfbError(ValueError):
    pass


def _sectors(raw: bytes, size: int):
    """Sector n lives at offset 512 + n·size (header is sector −1)."""
    return lambda n: raw[512 + n * size: 512 + (n + 1) * size]


def _chain(fat: list[int], start: int, limit: int) -> list[int]:
    out, cur = [], start
    while cur != _ENDOFCHAIN:
        if cur >= len(fat) or len(out) > limit:
            raise CfbError("broken FAT chain")
        out.append(cur)
        cur = fat[cur]
    return out


@corrupt_guard("cfb")
def read_cfb(raw: bytes) -> dict[str, bytes]:
    """CFB container → {stream name: content} (storages skipped)."""
    if raw[:8] != _MAGIC:
        raise CfbError("not an OLE2/CFB file (bad magic)")
    (sector_shift,) = struct.unpack_from("<H", raw, 30)
    (mini_shift,) = struct.unpack_from("<H", raw, 32)
    (n_fat,) = struct.unpack_from("<I", raw, 44)
    (dir_start,) = struct.unpack_from("<I", raw, 48)
    (minifat_start,) = struct.unpack_from("<I", raw, 60)
    (n_minifat,) = struct.unpack_from("<I", raw, 64)
    (difat_start,) = struct.unpack_from("<I", raw, 68)
    if difat_start not in (_ENDOFCHAIN, _FREE):
        raise CfbError("DIFAT extension sectors unsupported (file > ~55 MB)")
    size = 1 << sector_shift
    mini_size = 1 << mini_shift
    sect = _sectors(raw, size)

    difat = struct.unpack_from("<109I", raw, 76)
    fat: list[int] = []
    for s in difat[:n_fat]:
        fat.extend(struct.unpack(f"<{size // 4}I", sect(s)))

    # directory
    dir_raw = b"".join(sect(s) for s in _chain(fat, dir_start, len(fat)))
    entries = []
    for off in range(0, len(dir_raw), 128):
        ent = dir_raw[off: off + 128]
        (name_len,) = struct.unpack_from("<H", ent, 64)
        if name_len < 2:
            continue
        name = ent[: name_len - 2].decode("utf-16-le")
        etype = ent[66]
        (start,) = struct.unpack_from("<I", ent, 116)
        (sz,) = struct.unpack_from("<Q", ent, 120)
        entries.append((name, etype, start, sz))

    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise CfbError("no root directory entry")
    mini_stream = (
        b"".join(sect(s) for s in _chain(fat, root[2], len(fat)))
        if root[3] else b""
    )
    minifat: list[int] = []
    if n_minifat and minifat_start != _ENDOFCHAIN:
        mf_raw = b"".join(sect(s) for s in _chain(fat, minifat_start, len(fat)))
        minifat = list(struct.unpack(f"<{len(mf_raw) // 4}I", mf_raw))

    out: dict[str, bytes] = {}
    for name, etype, start, sz in entries:
        if etype != 2:  # stream objects only
            continue
        if sz < _MINI_CUTOFF:
            chain = _chain(minifat, start, len(minifat) or 1)
            data = b"".join(
                mini_stream[s * mini_size: (s + 1) * mini_size] for s in chain
            )
        else:
            data = b"".join(sect(s) for s in _chain(fat, start, len(fat)))
        out[name] = data[:sz]
    return out


def write_cfb(streams: dict[str, bytes]) -> bytes:
    """Minimal v3 CFB writer (512-byte sectors, ≤109 FAT sectors,
    mini-stream for small streams — the layout real writers emit)."""
    size, mini = 512, 64

    def pad(b: bytes, n: int) -> bytes:
        return b + b"\x00" * (-len(b) % n)

    # split streams into mini (< 4096) and regular
    names = list(streams)
    mini_data, mini_first = b"", {}
    for n in names:
        if len(streams[n]) < _MINI_CUTOFF:
            mini_first[n] = len(mini_data) // mini
            mini_data += pad(streams[n], mini)
    n_mini_sectors = len(mini_data) // mini

    sectors: list[bytes] = []  # body sectors, FAT filled afterwards
    fat: list[int] = []

    def add_chain(data: bytes) -> int:
        data = pad(data, size)
        first = len(sectors)
        n = len(data) // size
        for i in range(n):
            sectors.append(data[i * size: (i + 1) * size])
            fat.append(first + i + 1 if i < n - 1 else _ENDOFCHAIN)
        return first if n else _ENDOFCHAIN

    # reserve sector 0 for the FAT itself
    sectors.append(b"")
    fat.append(_FATSECT)

    minifat_start = _ENDOFCHAIN
    if n_mini_sectors:
        # default next-sector chaining, then terminate each stream's
        # last mini sector (streams tile the ministream contiguously)
        minifat = [i + 1 for i in range(n_mini_sectors)]
        for n in names:
            if n in mini_first:
                last = mini_first[n] + (len(pad(streams[n], mini)) // mini) - 1
                minifat[last] = _ENDOFCHAIN
        minifat_start = add_chain(
            b"".join(struct.pack("<I", v) for v in minifat)
        )
    regular_first = {
        n: add_chain(streams[n]) for n in names if n not in mini_first
    }
    mini_stream_start = add_chain(mini_data) if mini_data else _ENDOFCHAIN

    def dirent(name: str, etype: int, start: int, sz: int, child: int = _FREE) -> bytes:
        nm = name.encode("utf-16-le")
        return (
            pad(nm, 64)[:64]
            + struct.pack("<HBB", len(nm) + 2, etype, 1)
            + struct.pack("<III", _FREE, _FREE, child)
            + b"\x00" * 16  # CLSID
            + b"\x00" * 4  # state
            + b"\x00" * 16  # times
            + struct.pack("<IQ", start & 0xFFFFFFFF, sz)
        )

    dirs = [dirent("Root Entry", 5, mini_stream_start, len(mini_data), child=1)]
    for n in names:
        start = mini_first.get(n, regular_first.get(n, _ENDOFCHAIN))
        dirs.append(dirent(n, 2, start, len(streams[n])))
    while len(dirs) % 4:
        dirs.append(b"\x00" * 64 + struct.pack("<HBB", 0, 0, 0) + b"\x00" * 60)
    dir_start = add_chain(b"".join(dirs))

    if len(fat) > size // 4:
        raise CfbError("writer supports single-FAT-sector files only")
    fat_sector = pad(b"".join(struct.pack("<I", v) for v in fat), size)
    fat_sector = fat_sector[:size]
    sectors[0] = fat_sector

    header = (
        _MAGIC
        + b"\x00" * 16  # CLSID
        + struct.pack("<HH", 0x003E, 0x0003)  # minor, major
        + b"\xfe\xff"  # little-endian marker
        + struct.pack("<HH", 9, 6)  # sector / mini shifts
        + b"\x00" * 6
        + struct.pack("<I", 0)  # num dir sectors (v3: 0)
        + struct.pack("<I", 1)  # num FAT sectors
        + struct.pack("<I", dir_start)
        + struct.pack("<I", 0)  # transaction
        + struct.pack("<I", _MINI_CUTOFF)
        + struct.pack("<I", minifat_start)
        + struct.pack("<I", 1 if n_mini_sectors else 0)
        + struct.pack("<I", _ENDOFCHAIN)  # DIFAT start (none)
        + struct.pack("<I", 0)  # num DIFAT sectors
        + struct.pack("<I", 0)  # DIFAT[0] = FAT sector 0
        + b"\xff" * 4 * 108
    )
    assert len(header) == 512
    return header + b"".join(pad(s, size) for s in sectors)
