"""Pure-Python 7z archive codec (SURVEY S6).

The reference unpacks the REFIT dataset from a .7z archive with py7zr
(/root/reference/crawler/refit.py:51-61). py7zr is absent in this
container, but the 7z container format is public (7zFormat.txt in the
7-Zip/p7zip source distributions) and the heavy lifting — LZMA —
ships in stdlib ``lzma``. This module implements the subset those
crawler archives need:

- signature + end-header parsing (CRC-checked),
- unencoded AND LZMA-encoded headers (kEncodedHeader 0x17 — what the
  7z CLI writes by default),
- single-coder folders with Copy (00), LZMA1 (030101) or LZMA2 (21)
  coders, decoded via ``lzma`` raw filters,
- solid multi-file folders (SubStreamsInfo split + per-file CRC32),
- empty-stream files (kEmptyStream/kEmptyFile bit vectors).

NOT implemented (raise cleanly): encryption (AES 06f10701), filter
chains (BCJ/delta bind pairs), multi-volume archives. A writer for the
same subset exists so the reader is tested against independently
constructed archives, the same strategy as the GRIB2/xlsx codecs.
"""

from __future__ import annotations

import io
import lzma
import struct
import zlib

from open_energy_data_server_spark.sources._robust import corrupt_guard

_SIGNATURE = b"7z\xbc\xaf\x27\x1c"

# header property ids (7zFormat.txt)
_END = 0x00
_HEADER = 0x01
_ARCHIVE_PROPS = 0x02
_MAIN_STREAMS = 0x04
_FILES_INFO = 0x05
_PACK_INFO = 0x06
_UNPACK_INFO = 0x07
_SUBSTREAMS = 0x08
_SIZE = 0x09
_CRC = 0x0A
_FOLDER = 0x0B
_CODERS_UNPACK_SIZE = 0x0C
_NUM_UNPACK_STREAM = 0x0D
_EMPTY_STREAM = 0x0E
_EMPTY_FILE = 0x0F
_NAMES = 0x11
_ENCODED_HEADER = 0x17

_COPY = b"\x00"
_LZMA1 = b"\x03\x01\x01"
_LZMA2 = b"\x21"


class SevenZipError(ValueError):
    pass


class _Reader:
    def __init__(self, data: bytes):
        self._b = io.BytesIO(data)

    def read(self, n: int) -> bytes:
        out = self._b.read(n)
        if len(out) != n:
            raise SevenZipError("truncated 7z header")
        return out

    def byte(self) -> int:
        return self.read(1)[0]

    def num(self) -> int:
        """7z variable-length REAL_UINT64."""
        first = self.byte()
        mask, value = 0x80, 0
        for i in range(8):
            if not first & mask:
                return value | (first & (mask - 1)) << (8 * i)
            value |= self.byte() << (8 * i)
            mask >>= 1
        return value

    def bitvector(self, n: int) -> list[bool]:
        data = self.read((n + 7) // 8)
        return [bool(data[i // 8] & (0x80 >> (i % 8))) for i in range(n)]

    def bool_vector(self, n: int) -> list[bool]:
        """AllAreDefined byte, then either all-true or a bit vector."""
        if self.byte():
            return [True] * n
        return self.bitvector(n)


def _num(v: int) -> bytes:
    """Writer-side REAL_UINT64: single byte when small, else 0xFF+8LE."""
    if v < 0x80:
        return bytes([v])
    return b"\xff" + struct.pack("<Q", v)


class _Folder:
    def __init__(self, coder_id: bytes, props: bytes):
        self.coder_id = coder_id
        self.props = props
        self.unpack_size = 0
        self.crc: int | None = None


def _lzma2_dict_size(prop: int) -> int:
    if prop > 40:
        raise SevenZipError(f"bad LZMA2 dict-size prop {prop}")
    if prop == 40:
        return 0xFFFFFFFF
    return (2 | (prop & 1)) << (prop // 2 + 11)


def _decode_stream(coder_id: bytes, props: bytes, packed: bytes, unpack_size: int) -> bytes:
    if coder_id == _COPY:
        out = packed[:unpack_size]
    elif coder_id == _LZMA1:
        if len(props) != 5:
            raise SevenZipError("LZMA1 coder needs 5 prop bytes")
        d = props[0]
        lc, rem = d % 9, d // 9
        lp, pb = rem % 5, rem // 5
        dict_size = struct.unpack("<I", props[1:5])[0]
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA1, "dict_size": max(dict_size, 4096),
                      "lc": lc, "lp": lp, "pb": pb}],
        )
        out = dec.decompress(packed, max_length=unpack_size)
    elif coder_id == _LZMA2:
        if len(props) != 1:
            raise SevenZipError("LZMA2 coder needs 1 prop byte")
        dec = lzma.LZMADecompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": _lzma2_dict_size(props[0])}],
        )
        out = dec.decompress(packed, max_length=unpack_size)
    else:
        raise SevenZipError(
            f"unsupported 7z coder {coder_id.hex()} (Copy/LZMA1/LZMA2 implemented; "
            "encrypted or filter-chained archives are out of scope)"
        )
    if len(out) != unpack_size:
        raise SevenZipError(f"decoded {len(out)} bytes, expected {unpack_size}")
    return out


def _parse_folder(r: _Reader) -> _Folder:
    ncoders = r.num()
    if ncoders != 1:
        raise SevenZipError("only single-coder folders supported (no BCJ/filter chains)")
    flag = r.byte()
    coder_id = r.read(flag & 0x0F)
    nin = nout = 1
    if flag & 0x10:
        nin, nout = r.num(), r.num()
    props = r.read(r.num()) if flag & 0x20 else b""
    if flag & 0x80:
        raise SevenZipError("alternative coder methods unsupported")
    if (nin, nout) != (1, 1):
        raise SevenZipError("multi-stream coders unsupported")
    # single coder, one in/out stream → no bind pairs, one packed index
    return _Folder(coder_id, props)


def _parse_streams_info(r: _Reader):
    """StreamsInfo → (pack_pos, pack_sizes, folders, substreams).

    substreams: list of (folder_idx, size, crc|None) in stream order.
    """
    pack_pos, pack_sizes = 0, []
    folders: list[_Folder] = []
    substreams: list[tuple[int, int, int | None]] | None = None
    while True:
        tid = r.num()
        if tid == _END:
            break
        if tid == _PACK_INFO:
            pack_pos = r.num()
            npack = r.num()
            while True:
                sid = r.num()
                if sid == _END:
                    break
                if sid == _SIZE:
                    pack_sizes = [r.num() for _ in range(npack)]
                elif sid == _CRC:
                    defined = r.bool_vector(npack)
                    r.read(4 * sum(defined))
                else:
                    raise SevenZipError(f"unexpected id {sid:#x} in PackInfo")
        elif tid == _UNPACK_INFO:
            if r.num() != _FOLDER:
                raise SevenZipError("UnpackInfo must start with kFolder")
            nfolders = r.num()
            if r.byte():
                raise SevenZipError("external folder data unsupported")
            folders = [_parse_folder(r) for _ in range(nfolders)]
            if r.num() != _CODERS_UNPACK_SIZE:
                raise SevenZipError("missing CodersUnpackSize")
            for f in folders:
                f.unpack_size = r.num()
            while True:
                sid = r.num()
                if sid == _END:
                    break
                if sid == _CRC:
                    defined = r.bool_vector(nfolders)
                    for f, d in zip(folders, defined):
                        if d:
                            f.crc = struct.unpack("<I", r.read(4))[0]
                else:
                    raise SevenZipError(f"unexpected id {sid:#x} in UnpackInfo")
        elif tid == _SUBSTREAMS:
            nums = [1] * len(folders)
            sizes_given: dict[int, list[int]] = {}
            crcs: list[int | None] = []
            while True:
                sid = r.num()
                if sid == _END:
                    break
                if sid == _NUM_UNPACK_STREAM:
                    nums = [r.num() for _ in folders]
                elif sid == _SIZE:
                    for i, f in enumerate(folders):
                        if nums[i] == 0:
                            continue
                        given = [r.num() for _ in range(nums[i] - 1)]
                        sizes_given[i] = given + [f.unpack_size - sum(given)]
                elif sid == _CRC:
                    # digests only for substreams lacking a folder CRC
                    need = sum(
                        nums[i] for i, f in enumerate(folders)
                        if not (nums[i] == 1 and f.crc is not None)
                    )
                    defined = r.bool_vector(need)
                    vals = iter(
                        struct.unpack(f"<{sum(defined)}I", r.read(4 * sum(defined)))
                        if sum(defined) else ()
                    )
                    got = [next(vals) if d else None for d in defined]
                    gi = iter(got)
                    for i, f in enumerate(folders):
                        if nums[i] == 1 and f.crc is not None:
                            crcs.append(f.crc)
                        else:
                            crcs.extend(next(gi) for _ in range(nums[i]))
                else:
                    raise SevenZipError(f"unexpected id {sid:#x} in SubStreamsInfo")
            substreams = []
            for i, f in enumerate(folders):
                sizes = sizes_given.get(i, [f.unpack_size] * min(nums[i], 1))
                for s in sizes:
                    substreams.append((i, s, None))
            if crcs:
                substreams = [
                    (fi, s, c) for (fi, s, _), c in zip(substreams, crcs)
                ]
        else:
            raise SevenZipError(f"unexpected id {tid:#x} in StreamsInfo")
    if substreams is None:
        substreams = [
            (i, f.unpack_size, f.crc) for i, f in enumerate(folders)
        ]
    return pack_pos, pack_sizes, folders, substreams


def _decode_folders(raw: bytes, pack_pos: int, pack_sizes: list[int],
                    folders: list[_Folder]) -> list[bytes]:
    """Decode each folder's packed stream (one packed stream per folder)."""
    out = []
    offset = 32 + pack_pos
    for f, psize in zip(folders, pack_sizes):
        packed = raw[offset:offset + psize]
        offset += psize
        data = _decode_stream(f.coder_id, f.props, packed, f.unpack_size)
        if f.crc is not None and zlib.crc32(data) != f.crc:
            raise SevenZipError("folder CRC mismatch")
        out.append(data)
    return out


def _parse_files_info(r: _Reader):
    nfiles = r.num()
    empty_stream = [False] * nfiles
    empty_file: list[bool] = []
    names: list[str] = []
    while True:
        ptype = r.num()
        if ptype == _END:
            break
        size = r.num()
        data = r.read(size)
        pr = _Reader(data)
        if ptype == _EMPTY_STREAM:
            empty_stream = pr.bitvector(nfiles)
        elif ptype == _EMPTY_FILE:
            empty_file = pr.bitvector(sum(empty_stream))
        elif ptype == _NAMES:
            if pr.byte():
                raise SevenZipError("external names unsupported")
            # utf-16-le, each name terminated by a 2-byte NUL — walk in
            # 2-byte units (a plain bytes.split would cut inside chars)
            names = []
            buf = data[1:]
            start = i = 0
            while i + 1 < len(buf):
                if buf[i] == 0 and buf[i + 1] == 0:
                    names.append(buf[start:i].decode("utf-16-le"))
                    start = i + 2
                i += 2
        # unknown properties (mtime, attributes, dummy padding) are skipped
    return nfiles, empty_stream, empty_file, names


def is_7z(raw: bytes) -> bool:
    return raw[:6] == _SIGNATURE


@corrupt_guard("7z")
def read_7z(raw: bytes) -> dict[str, bytes]:
    """7z archive bytes → ordered {member name: content}. CRC-checked."""
    if not is_7z(raw):
        raise SevenZipError("not a 7z archive (bad signature)")
    if zlib.crc32(raw[12:32]) != struct.unpack("<I", raw[8:12])[0]:
        raise SevenZipError("start header CRC mismatch")
    nh_off, nh_size = struct.unpack("<QQ", raw[12:28])
    nh_crc = struct.unpack("<I", raw[28:32])[0]
    header = raw[32 + nh_off: 32 + nh_off + nh_size]
    if len(header) != nh_size or zlib.crc32(header) != nh_crc:
        raise SevenZipError("next header truncated or CRC mismatch")
    if not header:
        return {}

    r = _Reader(header)
    tid = r.num()
    if tid == _ENCODED_HEADER:
        pack_pos, pack_sizes, folders, _ = _parse_streams_info(r)
        decoded = _decode_folders(raw, pack_pos, pack_sizes, folders)
        r = _Reader(b"".join(decoded))
        tid = r.num()
    if tid != _HEADER:
        raise SevenZipError(f"expected kHeader, got {tid:#x}")

    pack_pos, pack_sizes, folders, substreams = 0, [], [], []
    nfiles, empty_stream, empty_file, names = 0, [], [], []
    while True:
        tid = r.num()
        if tid == _END:
            break
        if tid == _MAIN_STREAMS:
            pack_pos, pack_sizes, folders, substreams = _parse_streams_info(r)
        elif tid == _FILES_INFO:
            nfiles, empty_stream, empty_file, names = _parse_files_info(r)
        elif tid == _ARCHIVE_PROPS:
            while True:
                pid = r.num()
                if pid == _END:
                    break
                r.read(r.num())
        else:
            raise SevenZipError(f"unsupported header section {tid:#x}")

    folder_data = _decode_folders(raw, pack_pos, pack_sizes, folders)
    # split folder payloads into substreams
    contents: list[bytes] = []
    cursors = [0] * len(folder_data)
    for fi, size, crc in substreams:
        chunk = folder_data[fi][cursors[fi]:cursors[fi] + size]
        cursors[fi] += size
        if crc is not None and zlib.crc32(chunk) != crc:
            raise SevenZipError("substream CRC mismatch")
        contents.append(chunk)

    if not names:
        names = [f"member{i}" for i in range(max(nfiles, len(contents)))]
    out: dict[str, bytes] = {}
    ci = 0
    ei = 0
    for i, name in enumerate(names):
        if i < len(empty_stream) and empty_stream[i]:
            # empty stream: file if the EmptyFile bit says so, else a dir
            is_file = empty_file[ei] if ei < len(empty_file) else False
            ei += 1
            if is_file:
                out[name] = b""
            continue
        out[name] = contents[ci] if ci < len(contents) else b""
        ci += 1
    return out


# --- writer (same subset; exists so the reader is testable offline) ---

_LZMA1_FILTER = {"id": lzma.FILTER_LZMA1, "dict_size": 1 << 20, "lc": 3, "lp": 0, "pb": 2}
_LZMA1_PROPS = bytes([(2 * 5 + 0) * 9 + 3]) + struct.pack("<I", 1 << 20)


def _compress_block(payload: bytes, codec: str) -> tuple[bytes, bytes, bytes]:
    """→ (packed, coder_id, props)."""
    if codec == "copy":
        return payload, _COPY, b""
    if codec == "lzma1":
        c = lzma.LZMACompressor(format=lzma.FORMAT_RAW, filters=[_LZMA1_FILTER])
        return c.compress(payload) + c.flush(), _LZMA1, _LZMA1_PROPS
    if codec == "lzma2":
        c = lzma.LZMACompressor(
            format=lzma.FORMAT_RAW,
            filters=[{"id": lzma.FILTER_LZMA2, "dict_size": 1 << 20}],
        )
        # dict-size prop byte for 1 MiB: (2|0)<<(p//2+11) == 1<<20 → p=18
        return c.compress(payload) + c.flush(), _LZMA2, bytes([18])
    raise SevenZipError(f"unknown codec {codec!r}")


def _streams_info_bytes(pack_pos: int, packed_size: int, unpack_size: int,
                        coder_id: bytes, props: bytes,
                        sub_sizes: list[int] | None = None,
                        sub_crcs: list[int] | None = None) -> bytes:
    flag = len(coder_id) | (0x20 if props else 0)
    folder = _num(1) + bytes([flag]) + coder_id
    if props:
        folder += _num(len(props)) + props
    out = bytes([_PACK_INFO]) + _num(pack_pos) + _num(1)
    out += bytes([_SIZE]) + _num(packed_size) + bytes([_END])
    out += bytes([_UNPACK_INFO, _FOLDER]) + _num(1) + b"\x00" + folder
    out += bytes([_CODERS_UNPACK_SIZE]) + _num(unpack_size) + bytes([_END])
    if sub_sizes is not None:
        out += bytes([_SUBSTREAMS, _NUM_UNPACK_STREAM]) + _num(len(sub_sizes))
        out += bytes([_SIZE]) + b"".join(_num(s) for s in sub_sizes[:-1])
        if sub_crcs:
            out += bytes([_CRC]) + b"\x01" + b"".join(
                struct.pack("<I", c) for c in sub_crcs
            )
        out += bytes([_END])
    out += bytes([_END])
    return out


def write_7z(files: dict[str, bytes], codec: str = "lzma1",
             encoded_header: bool = False) -> bytes:
    """Build a 7z archive: one solid folder over all non-empty members."""
    names = list(files)
    nonempty = [n for n in names if files[n]]
    payload = b"".join(files[n] for n in nonempty)
    packed, coder_id, props = _compress_block(payload, codec)

    streams = _streams_info_bytes(
        0, len(packed), len(payload), coder_id, props,
        sub_sizes=[len(files[n]) for n in nonempty],
        sub_crcs=[zlib.crc32(files[n]) for n in nonempty],
    ) if nonempty else b""

    files_info = _num(len(names))
    if len(nonempty) != len(names):
        bits = bytearray((len(names) + 7) // 8)
        n_empty = 0
        for i, n in enumerate(names):
            if not files[n]:
                bits[i // 8] |= 0x80 >> (i % 8)
                n_empty += 1
        files_info += bytes([_EMPTY_STREAM]) + _num(len(bits)) + bytes(bits)
        ebits = bytearray((n_empty + 7) // 8)
        for i in range(n_empty):  # every empty stream is an empty FILE
            ebits[i // 8] |= 0x80 >> (i % 8)
        files_info += bytes([_EMPTY_FILE]) + _num(len(ebits)) + bytes(ebits)
    name_blob = b"\x00" + b"".join(n.encode("utf-16-le") + b"\x00\x00" for n in names)
    files_info += bytes([_NAMES]) + _num(len(name_blob)) + name_blob
    files_info += bytes([_END])

    header = bytes([_HEADER])
    if streams:
        header += bytes([_MAIN_STREAMS]) + streams
    header += bytes([_FILES_INFO]) + files_info + bytes([_END])

    body = packed
    if encoded_header:
        hpacked, hcid, hprops = _compress_block(header, "lzma1")
        hstreams = _streams_info_bytes(
            len(packed), len(hpacked), len(header), hcid, hprops
        )
        body += hpacked
        next_header = bytes([_ENCODED_HEADER]) + hstreams
    else:
        next_header = header

    sig_tail = struct.pack("<QQI", len(body), len(next_header), zlib.crc32(next_header))
    return (
        _SIGNATURE + b"\x00\x04" + struct.pack("<I", zlib.crc32(sig_tail))
        + sig_tail + body + next_header
    )
