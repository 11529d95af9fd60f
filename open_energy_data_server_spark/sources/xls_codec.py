"""Pure-Python legacy .xls parser (BIFF8, SURVEY S5).

Closes the one remaining gated Excel path: ``sources.excel`` formerly
required xlrd for .xls (absent in this container). A BIFF8 workbook is
a CFB container (``sources.cfb``) whose ``Workbook`` stream is a
sequence of (opcode, length, payload) records — all publicly specified
in [MS-XLS]. Implemented subset (what the reference's Excel-fed
crawlers need — tabular sheets read with sheet_name / skiprows /
header, /root/reference/crawler/regelleistung.py:535,
crawler/iwugebaeudetypen.py:44-49):

- workbook globals: BOF, BOUNDSHEET (sheet name → substream offset),
  SST incl. CONTINUE records (option flags re-specified per fragment),
- worksheet cells: LABELSST, NUMBER, RK, MULRK, LABEL, BOOLERR,
  FORMULA (cached numeric/bool/string results + trailing STRING),
  BLANK/MULBLANK (skipped),
- both compressed (latin-ish 8-bit) and UTF-16 string encodings, rich
  and extended string payloads skipped per spec.

NOT implemented: BIFF5 and earlier, encrypted workbooks (FILEPASS
raises), date-format detection (serial numbers pass through, like the
.xlsx codec).
"""

from __future__ import annotations

import struct

import pandas as pd

from open_energy_data_server_spark.sources.cfb import read_cfb, write_cfb

from open_energy_data_server_spark.sources._robust import corrupt_guard

# record opcodes ([MS-XLS])
_BOF = 0x0809
_EOF = 0x000A
_BOUNDSHEET = 0x0085
_SST = 0x00FC
_CONTINUE = 0x003C
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_LABEL = 0x0204
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_FILEPASS = 0x002F


class XlsError(ValueError):
    pass


def _records(stream: bytes, start: int = 0):
    off = start
    while off + 4 <= len(stream):
        op, ln = struct.unpack_from("<HH", stream, off)
        yield op, stream[off + 4: off + 4 + ln], off
        off += 4 + ln
        if op == _EOF and start:  # substream end (globals keep going)
            return


def _decode_rk(rk: int) -> float | int:
    div100 = rk & 1
    if rk & 2:  # 30-bit signed integer
        v = rk >> 2
        if v & (1 << 29):
            v -= 1 << 30
    else:  # high 30 bits of an IEEE double
        (v,) = struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))
    return v / 100 if div100 else v


def _read_unicode(buf: bytes, off: int, cch: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString at ``off`` (cch already read):
    returns (text, next offset)."""
    grbit = buf[off]
    off += 1
    n_rich = n_ext = 0
    if grbit & 0x08:
        (n_rich,) = struct.unpack_from("<H", buf, off)
        off += 2
    if grbit & 0x04:
        (n_ext,) = struct.unpack_from("<I", buf, off)
        off += 4
    if grbit & 0x01:
        text = buf[off: off + 2 * cch].decode("utf-16-le")
        off += 2 * cch
    else:
        text = buf[off: off + cch].decode("latin-1")
        off += cch
    return text, off + 4 * n_rich + n_ext


def _parse_sst(stream: bytes) -> list[str]:
    """SST + CONTINUE records → shared strings. A string may span a
    record boundary; each CONTINUE fragment re-specifies the option
    flags for the characters it carries, so the splice can even switch
    between compressed and UTF-16 encodings mid-string."""
    frags: list[bytes] = []
    total = None
    for op, data, _ in _records(stream):
        if op == _SST:
            (total,) = struct.unpack_from("<I", data, 4)
            frags = [data[8:]]
        elif op == _CONTINUE and frags:
            frags.append(data)
        elif frags and op not in (_SST, _CONTINUE):
            break
    if total is None:
        return []

    out: list[str] = []
    fi, off = 0, 0

    def need(n: int) -> bytes:
        """Read n raw bytes, never crossing a fragment boundary for a
        fixed-width header (headers are not split in practice)."""
        nonlocal fi, off
        if off >= len(frags[fi]):
            fi, off = fi + 1, 0
        chunk = frags[fi][off: off + n]
        off += n
        return chunk

    while len(out) < total:
        (cch,) = struct.unpack("<H", need(2))
        grbit = need(1)[0]
        n_rich = struct.unpack("<H", need(2))[0] if grbit & 0x08 else 0
        n_ext = struct.unpack("<I", need(4))[0] if grbit & 0x04 else 0
        text = ""
        remaining = cch
        wide = bool(grbit & 0x01)
        while remaining:
            if off >= len(frags[fi]):
                if fi + 1 >= len(frags):
                    raise XlsError("truncated SST (string continues past last fragment)")
                fi, off = fi + 1, 0
                wide = bool(frags[fi][off] & 0x01)  # continue re-flags
                off += 1
            avail = len(frags[fi]) - off
            take = min(remaining, avail // 2 if wide else avail)
            if take == 0:
                # odd trailing byte before a wide run: spec-conformant
                # writers split at char boundaries, so this is corrupt —
                # raise instead of spinning forever
                raise XlsError("corrupt SST (fragment splits a UTF-16 code unit)")
            if wide:
                text += frags[fi][off: off + 2 * take].decode("utf-16-le")
                off += 2 * take
            else:
                text += frags[fi][off: off + take].decode("latin-1")
                off += take
            remaining -= take
        skip = 4 * n_rich + n_ext
        while skip:
            if off >= len(frags[fi]):
                fi, off = fi + 1, 0
            step = min(skip, len(frags[fi]) - off)
            off += step
            skip -= step
        out.append(text)
    return out


def _parse_sheet(stream: bytes, start: int, sst: list[str]) -> dict[int, dict[int, object]]:
    rows: dict[int, dict[int, object]] = {}

    def put(r: int, c: int, v: object) -> None:
        rows.setdefault(r, {})[c] = v

    pending_formula: tuple[int, int] | None = None
    for op, data, _ in _records(stream, start):
        if op == _FILEPASS:
            raise XlsError("encrypted .xls workbooks unsupported")
        if op == _LABELSST:
            r, c, _xf, isst = struct.unpack_from("<HHHI", data)
            put(r, c, sst[isst])
        elif op == _NUMBER:
            r, c, _xf = struct.unpack_from("<HHH", data)
            put(r, c, struct.unpack_from("<d", data, 6)[0])
        elif op == _RK:
            r, c, _xf, rk = struct.unpack_from("<HHHI", data)
            put(r, c, _decode_rk(rk))
        elif op == _MULRK:
            r, c0 = struct.unpack_from("<HH", data)
            n = (len(data) - 6) // 6
            for i in range(n):
                _xf, rk = struct.unpack_from("<HI", data, 4 + 6 * i)
                put(r, c0 + i, _decode_rk(rk))
        elif op == _LABEL:
            r, c, _xf, cch = struct.unpack_from("<HHHH", data)
            put(r, c, _read_unicode(data, 8, cch)[0])
        elif op == _BOOLERR:
            r, c, _xf, val, is_err = struct.unpack_from("<HHHBB", data)
            put(r, c, None if is_err else bool(val))
        elif op == _FORMULA:
            r, c, _xf = struct.unpack_from("<HHH", data)
            result = data[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # string: value follows in a STRING record
                    pending_formula = (r, c)
                elif kind == 1:
                    put(r, c, bool(result[2]))
                else:  # error / empty
                    put(r, c, None)
            else:
                put(r, c, struct.unpack("<d", result)[0])
        elif op == _STRING and pending_formula is not None:
            (cch,) = struct.unpack_from("<H", data)
            put(*pending_formula, _read_unicode(data, 2, cch)[0])
            pending_formula = None
    return rows


@corrupt_guard("xls")
def parse_xls(
    raw: bytes,
    sheet: str | int = 0,
    skiprows: int = 0,
    header: bool = True,
) -> pd.DataFrame:
    """.xls bytes → pandas frame (same shape contract as parse_xlsx)."""
    streams = read_cfb(raw)
    book = streams.get("Workbook", streams.get("Book"))
    if book is None:
        raise XlsError(f"no Workbook stream in CFB container (have {sorted(streams)})")

    sheets: list[tuple[str, int]] = []  # (name, substream offset)
    for op, data, _ in _records(book):
        if op == _FILEPASS:
            raise XlsError("encrypted .xls workbooks unsupported")
        if op == _BOUNDSHEET:
            (pos,) = struct.unpack_from("<I", data)
            cch = data[6]
            grbit = data[7]
            raw_name = data[8: 8 + (2 * cch if grbit & 1 else cch)]
            name = raw_name.decode("utf-16-le" if grbit & 1 else "latin-1")
            sheets.append((name, pos))
        elif op == _EOF:
            break
    if not sheets:
        raise XlsError("workbook has no sheets")
    if isinstance(sheet, int):
        if sheet >= len(sheets):
            raise XlsError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
        chosen = sheets[sheet]
    else:
        by_name = dict(sheets)
        if sheet not in by_name:
            raise XlsError(f"no sheet named {sheet!r}; have {[n for n, _ in sheets]}")
        chosen = (sheet, by_name[sheet])

    sst = _parse_sst(book)
    rows = _parse_sheet(book, chosen[1], sst)

    if not rows:
        return pd.DataFrame()
    ordered = [rows.get(i, {}) for i in range(skiprows, max(rows) + 1)]
    max_col = max((c for cells in ordered for c in cells), default=-1)
    grid = [[cells.get(j) for j in range(max_col + 1)] for cells in ordered]
    if header:
        if not grid:
            return pd.DataFrame()
        names = [
            str(h) if h is not None else f"Unnamed: {j}"
            for j, h in enumerate(grid[0])
        ]
        return pd.DataFrame(grid[1:], columns=names)
    return pd.DataFrame(grid)


# --- fixture writer (same subset; offline test strategy) ---


def _rec(op: int, payload: bytes) -> bytes:
    return struct.pack("<HH", op, len(payload)) + payload


def _ustr(s: str) -> bytes:
    """16-bit-cch unicode string, compressed when latin-1 fits."""
    try:
        return struct.pack("<HB", len(s), 0) + s.encode("latin-1")
    except UnicodeEncodeError:
        return struct.pack("<HB", len(s), 1) + s.encode("utf-16-le")


def write_xls(sheets: dict[str, list[list[object]]], pad_to_regular: bool = False) -> bytes:
    """Rows of str/float/int/bool/None → a BIFF8 .xls container.
    Strings go through the SST (LABELSST cells); ints use RK encoding;
    ``pad_to_regular`` grows the stream past the 4096-byte mini cutoff
    to exercise the regular-FAT path."""
    strings: list[str] = []
    index: dict[str, int] = {}
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str) and v not in index:
                    index[v] = len(strings)
                    strings.append(v)

    sheet_blobs = []
    for rows in sheets.values():
        body = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x3515, 0x0786, 1, 0))
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, str):
                    body += _rec(_LABELSST, struct.pack("<HHHI", r, c, 0, index[v]))
                elif isinstance(v, bool):
                    body += _rec(_BOOLERR, struct.pack("<HHHBB", r, c, 0, int(v), 0))
                elif isinstance(v, int) and -(1 << 29) <= v < (1 << 29):
                    rk = ((v << 2) | 2) & 0xFFFFFFFF  # 30-bit int encoding
                    body += _rec(_RK, struct.pack("<HHHI", r, c, 0, rk))
                else:
                    body += _rec(_NUMBER, struct.pack("<HHHd", r, c, 0, float(v)))
        body += _rec(_EOF, b"")
        sheet_blobs.append(body)

    n_cells = sum(len(r) for rows in sheets.values() for r in rows)
    sst_payload = struct.pack("<II", n_cells, len(strings)) + b"".join(
        _ustr(s) for s in strings
    )
    globals_fixed = _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x3515, 0x0786, 1, 0))
    globals_fixed += _rec(_SST, sst_payload)

    # BOUNDSHEET records reference absolute substream offsets — build
    # them twice (sizes are position-independent)
    def boundsheets(base: int) -> bytes:
        out, pos = b"", base
        for name, blob in zip(sheets, sheet_blobs):
            nm = name.encode("latin-1")
            out += _rec(_BOUNDSHEET, struct.pack("<IBB", pos, 0, 0) + bytes([len(nm), 0]) + nm)
            pos += len(blob)
        return out

    probe = boundsheets(0)
    head_len = len(globals_fixed) + len(probe) + 4  # + EOF record
    book = globals_fixed + boundsheets(head_len) + _rec(_EOF, b"")
    for blob in sheet_blobs:
        book += blob
    if pad_to_regular and len(book) < 4096:
        # trailing free space after the final EOF is ignored by readers
        book += b"\x00" * (4200 - len(book))
    return write_cfb({"Workbook": book})
