"""Pure-Python OpenFileGDB (.gdbtable/.gdbtablx) decoder — common case.

Completes SURVEY S10's seam: the reference's largest single scan is a
12.7M-row ESRI FileGDB table read in driver-side chunks
(/root/reference/crawler/nrw_kwp_waermedichte.py:61-76, via fiona).
``read_gdb`` (sources/shapefile.py) already distributes that scan as
range slices; this module supplies a dependency-free per-slice decoder
so the path runs with no fiona/GDAL import.

Format knowledge is the publicly reverse-engineered FileGDB spec (the
basis of GDAL's OpenFileGDB driver; ESRI never published it). Scope is
the COMMON CASE a cadastral/attribute table needs:

- ``.gdbtablx``: row-id → file-offset index (magic 3, 1024-row blocks,
  4/5/6-byte little-endian offsets; offset 0 = deleted row).
- ``.gdbtable``: 40-byte header → field-descriptor section → row blobs.
- Field types: objectid (implicit, not stored), int16, int32, float32,
  float64, datetime (float64 days since 1899-12-30), string/xml
  (varuint length + UTF-8), binary (varuint + bytes), geometry.
- Null bitmap over NULLABLE fields only (LSB-first, 1 = null).
- Geometry blobs: point / polyline / polygon in the delta-varint
  "extended shape buffer" encoding (coordinates quantized by
  (origin, xyscale) from the field descriptor; signed varints carry
  the sign in bit 6 of the first byte), emitted as WKT.

Honest capability boundary: raster fields, spatial indexes, and the
compressed .gdbtable variant raise ValueError — the ``read_gdb``
fiona-injection seam remains for those. Layout corners the public
spec leaves grey (the spatial-grid tail of the geometry descriptor)
are parsed tolerantly and exercised by this repo's spec-derived
fixtures; a real-world file that trips them should fall back to the
injected reader.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass

import numpy as np
import pandas as pd

from open_energy_data_server_spark.sources._robust import corrupt_guard

FIELD_INT16 = 0
FIELD_INT32 = 1
FIELD_FLOAT32 = 2
FIELD_FLOAT64 = 3
FIELD_STRING = 4
FIELD_DATETIME = 5
FIELD_OBJECTID = 6
FIELD_GEOMETRY = 7
FIELD_BINARY = 8
FIELD_RASTER = 9
FIELD_UUID_A = 10
FIELD_UUID_B = 11
FIELD_XML = 12

_EPOCH_1899 = pd.Timestamp("1899-12-30")


def read_varuint(buf: bytes, pos: int) -> tuple[int, int]:
    """LEB128 unsigned varint (7 data bits per byte, LE)."""
    val, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """FileGDB signed varint: bit 6 of the FIRST byte is the sign,
    bits 0-5 are the low magnitude bits; later bytes carry 7 bits."""
    b = buf[pos]
    pos += 1
    neg = bool(b & 0x40)
    val = b & 0x3F
    shift = 6
    while b & 0x80:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        shift += 7
    return (-val if neg else val), pos


@dataclass
class GdbField:
    name: str
    ftype: int
    nullable: bool


@dataclass
class GeomMeta:
    xorigin: float
    yorigin: float
    xyscale: float
    has_z: bool
    has_m: bool


class GdbTable:
    """One .gdbtable + .gdbtablx pair, random-access by row range."""

    @corrupt_guard("gdbtable")
    def __init__(self, table_path: str):
        if not table_path.endswith(".gdbtable"):
            raise ValueError(f"expected a .gdbtable path, got {table_path}")
        with open(table_path, "rb") as fh:
            self._buf = fh.read()
        tablx = table_path[: -len(".gdbtable")] + ".gdbtablx"
        if not os.path.exists(tablx):
            raise ValueError(f"missing row index {tablx}")
        with open(tablx, "rb") as fh:
            xbuf = fh.read()
        self.fields: list[GdbField] = []
        self.geom: GeomMeta | None = None
        self._parse_header()
        # parallel lists over LIVE rows: file offset + true 1-based
        # OBJECTID (the .gdbtablx position — deleted rows leave gaps)
        self._offsets, self._rowids = self._parse_tablx(xbuf)

    # --- structure -------------------------------------------------
    def _parse_header(self) -> None:
        buf = self._buf
        magic = struct.unpack_from("<i", buf, 0)[0]
        if magic != 3:
            # ESRI's "Compress File Geodatabase Data" rewrites tables
            # into the proprietary CDF layout, which no public spec or
            # open-source reader (including GDAL's OpenFileGDB driver)
            # decodes — fail loudly and name the seam instead of a
            # generic bad-magic error deep in octet math.
            raise ValueError(
                f"not an uncompressed .gdbtable (magic {magic}, expected 3)"
                " — compressed-geodatabase (CDF) tables have no public"
                " layout; decompress in ArcGIS or inject an ESRI-SDK"
                " reader via read_gdb(..., reader=...)"
            )
        self.n_valid_rows = struct.unpack_from("<i", buf, 4)[0]
        field_off = struct.unpack_from("<q", buf, 32)[0]
        pos = field_off
        sec_len = struct.unpack_from("<i", buf, pos)[0]
        sec_end = pos + 4 + sec_len
        pos += 4
        version = struct.unpack_from("<i", buf, pos)[0]
        if version not in (3, 4):
            raise ValueError(f"unsupported .gdbtable version {version}")
        pos += 4
        pos += 4  # geometry-table-type byte + 3 layout-flag bytes
        n_fields = struct.unpack_from("<h", buf, pos)[0]
        pos += 2
        for _ in range(n_fields):
            pos = self._parse_field(pos)
        if pos > sec_end:
            raise ValueError("field descriptors overran their section")
        self._row0 = sec_end

    def _utf16(self, pos: int) -> tuple[str, int]:
        n = self._buf[pos]
        pos += 1
        s = self._buf[pos : pos + 2 * n].decode("utf-16-le")
        return s, pos + 2 * n

    def _parse_field(self, pos: int) -> int:
        buf = self._buf
        name, pos = self._utf16(pos)
        _alias, pos = self._utf16(pos)
        ftype = buf[pos]
        pos += 1
        nullable = True
        if ftype == FIELD_OBJECTID:
            pos += 2  # two constant bytes
            nullable = False
        elif ftype in (FIELD_INT16, FIELD_INT32, FIELD_FLOAT32,
                       FIELD_FLOAT64, FIELD_DATETIME):
            pos += 1  # storage width
            flag = buf[pos]
            pos += 1
            nullable = bool(flag & 1)
            if flag & 4:  # default value: length-prefixed
                dlen = buf[pos]
                pos += 1 + dlen
        elif ftype in (FIELD_STRING, FIELD_XML):
            pos += 4  # int32 max length
            flag = buf[pos]
            pos += 1
            nullable = bool(flag & 1)
            if flag & 4:
                dlen, pos = read_varuint(buf, pos)
                pos += dlen
        elif ftype == FIELD_GEOMETRY:
            pos += 1  # constant byte
            flag = buf[pos]
            pos += 1
            nullable = bool(flag & 1)
            srs_bytes = struct.unpack_from("<h", buf, pos)[0]
            pos += 2 + srs_bytes
            flags3 = buf[pos]
            pos += 1
            has_m = bool(flags3 & 4)
            has_z = bool(flags3 & 2)
            n_doubles = 3 + (2 if has_m else 0) + (2 if has_z else 0)
            vals = struct.unpack_from(f"<{n_doubles}d", buf, pos)
            pos += 8 * n_doubles
            xorigin, yorigin, xyscale = vals[0], vals[1], vals[2]
            # tolerances
            pos += 8 * (1 + (1 if has_m else 0) + (1 if has_z else 0))
            pos += 32  # xmin, ymin, xmax, ymax
            # spatial-grid tail (grey area in the public spec): one
            # pad byte, varuint grid count, count float64 grid sizes
            pos += 1
            n_grid, pos = read_varuint(buf, pos)
            if n_grid > 16:
                raise ValueError(
                    f"implausible spatial-grid count {n_grid} — geometry "
                    "descriptor tail not understood; inject a fiona reader"
                )
            pos += 8 * n_grid
            self.geom = GeomMeta(xorigin, yorigin, xyscale, has_z, has_m)
        elif ftype == FIELD_BINARY:
            pos += 1  # constant byte
            flag = buf[pos]
            pos += 1
            nullable = bool(flag & 1)
        elif ftype in (FIELD_UUID_A, FIELD_UUID_B):
            pos += 1
            flag = buf[pos]
            pos += 1
            nullable = bool(flag & 1)
        else:
            raise ValueError(
                f"field {name!r}: type {ftype} unsupported by the pure "
                "decoder (raster?) — inject a fiona reader"
            )
        self.fields.append(GdbField(name, ftype, nullable))
        return pos

    @staticmethod
    def _parse_tablx(xbuf: bytes) -> tuple[list[int], list[int]]:
        magic, n_blocks, n_rows, osize = struct.unpack_from("<4i", xbuf, 0)
        if magic != 3:
            raise ValueError("not a .gdbtablx (bad magic)")
        if osize not in (4, 5, 6):
            raise ValueError(f"unsupported .gdbtablx offset size {osize}")
        # A dense index has ceil(n_rows/1024) 1024-row blocks. A sparse
        # index (blocks omitted after bulk deletes, signalled by a
        # trailing block map) has fewer — reading it as dense would
        # yield garbage offsets and silently wrong OBJECTIDs, so raise
        # and let read_gdb fall back to an injected reader.
        if n_blocks != (n_rows + 1023) // 1024:
            raise ValueError(
                f"sparse .gdbtablx ({n_blocks} blocks for {n_rows} rows; "
                "block map unsupported) — inject a fiona reader"
            )
        offs, rowids = [], []
        pos = 16
        for i in range(n_rows):
            off = int.from_bytes(xbuf[pos : pos + osize], "little")
            pos += osize
            if off != 0:  # 0 = deleted/absent row
                offs.append(off)
                rowids.append(i + 1)
        return offs, rowids

    # --- rows ------------------------------------------------------
    @corrupt_guard("gdbtable")
    def read_rows(self, start: int, stop: int) -> pd.DataFrame:
        """Decode valid rows [start, stop) (0-based over live rows,
        the same chunk semantics as the reference's fiona slices)."""
        cols: dict[str, list] = {f.name: [] for f in self.fields}
        n_nullable = sum(1 for f in self.fields if f.nullable)
        bitmap_bytes = (n_nullable + 7) // 8
        for rid in range(start, min(stop, len(self._offsets))):
            off = self._offsets[rid]
            blob_len = struct.unpack_from("<i", self._buf, off)[0]
            blob = self._buf[off + 4 : off + 4 + blob_len]
            pos = bitmap_bytes
            nth_nullable = 0
            for f in self.fields:
                if f.nullable:
                    is_null = bool(
                        blob[nth_nullable >> 3] & (1 << (nth_nullable & 7))
                    )
                    nth_nullable += 1
                    if is_null:
                        cols[f.name].append(None)
                        continue
                if f.ftype == FIELD_OBJECTID:
                    # not stored: implicit, = the .gdbtablx position
                    cols[f.name].append(self._rowids[rid])
                elif f.ftype == FIELD_INT16:
                    cols[f.name].append(struct.unpack_from("<h", blob, pos)[0])
                    pos += 2
                elif f.ftype == FIELD_INT32:
                    cols[f.name].append(struct.unpack_from("<i", blob, pos)[0])
                    pos += 4
                elif f.ftype == FIELD_FLOAT32:
                    cols[f.name].append(struct.unpack_from("<f", blob, pos)[0])
                    pos += 4
                elif f.ftype == FIELD_FLOAT64:
                    cols[f.name].append(struct.unpack_from("<d", blob, pos)[0])
                    pos += 8
                elif f.ftype == FIELD_DATETIME:
                    days = struct.unpack_from("<d", blob, pos)[0]
                    pos += 8
                    cols[f.name].append(
                        _EPOCH_1899 + pd.Timedelta(days=float(days))
                    )
                elif f.ftype in (FIELD_STRING, FIELD_XML):
                    n, pos = read_varuint(blob, pos)
                    cols[f.name].append(blob[pos : pos + n].decode("utf-8"))
                    pos += n
                elif f.ftype == FIELD_BINARY:
                    n, pos = read_varuint(blob, pos)
                    cols[f.name].append(bytes(blob[pos : pos + n]))
                    pos += n
                elif f.ftype in (FIELD_UUID_A, FIELD_UUID_B):
                    cols[f.name].append(bytes(blob[pos : pos + 16]).hex())
                    pos += 16
                elif f.ftype == FIELD_GEOMETRY:
                    n, pos = read_varuint(blob, pos)
                    cols[f.name].append(
                        self._geom_wkt(blob[pos : pos + n])
                    )
                    pos += n
        return pd.DataFrame(
            {name: pd.Series(vals, dtype=object) for name, vals in cols.items()}
        )

    def _geom_wkt(self, g: bytes) -> str | None:
        assert self.geom is not None, "geometry value without descriptor"
        m = self.geom
        gtype, pos = read_varuint(g, 0)
        base = gtype & 0xFF
        if base == 0:
            return None
        if base in (1, 9, 11, 21):  # point (+z/m variants)
            vx, pos = read_varuint(g, pos)
            vy, pos = read_varuint(g, pos)
            if vx == 0:
                return "POINT EMPTY"
            x = (vx - 1) / m.xyscale + m.xorigin
            y = (vy - 1) / m.xyscale + m.yorigin
            return f"POINT ({x:.10g} {y:.10g})"
        if base in (3, 5, 10, 13, 15, 19, 23, 25, 50, 51, 54):
            is_polygon = base in (5, 15, 19, 25, 51)
            n_points, pos = read_varuint(g, pos)
            if n_points == 0:
                return "POLYGON EMPTY" if is_polygon else "LINESTRING EMPTY"
            n_parts, pos = read_varuint(g, pos)
            for _ in range(4):  # quantized bbox
                _, pos = read_varuint(g, pos)
            counts = []
            for _ in range(max(0, n_parts - 1)):
                c, pos = read_varuint(g, pos)
                counts.append(c)
            counts.append(n_points - sum(counts))
            ix = iy = 0
            parts: list[list[tuple[float, float]]] = []
            for c in counts:
                pts = []
                for _ in range(c):
                    dx, pos = read_varint(g, pos)
                    dy, pos = read_varint(g, pos)
                    ix += dx
                    iy += dy
                    pts.append(
                        (ix / m.xyscale + m.xorigin, iy / m.xyscale + m.yorigin)
                    )
                parts.append(pts)
            if is_polygon:
                body = ", ".join(
                    "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in p) + ")"
                    for p in parts
                )
                return f"POLYGON ({body})"
            if len(parts) == 1:
                return (
                    "LINESTRING ("
                    + ", ".join(f"{x:.10g} {y:.10g}" for x, y in parts[0])
                    + ")"
                )
            body = ", ".join(
                "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in p) + ")"
                for p in parts
            )
            return f"MULTILINESTRING ({body})"
        raise ValueError(
            f"geometry shape type {base} unsupported by the pure decoder"
        )


def resolve_table_file(gdb_dir: str, table: str) -> str:
    """Locate ``<table>.gdbtable`` inside a .gdb directory. The table
    arg is either the file stem (``a00000004``-style) or a LAYER NAME,
    resolved through the ``a00000001`` system catalog (GDB_SystemCatalog:
    one row per table, its Name field + OBJECTID n ↔ file ``a%08x`` of
    n — how the reference's ``fiona.open(gdb, layer=...)`` finds its
    12.7M-row table by name)."""
    cand = os.path.join(gdb_dir, f"{table}.gdbtable")
    if os.path.exists(cand):
        return cand
    catalog = os.path.join(gdb_dir, "a00000001.gdbtable")
    names: list[str] = []
    if os.path.exists(catalog):
        cat = GdbTable(catalog)
        rows = cat.read_rows(0, len(cat._offsets))
        name_col = next(
            (f.name for f in cat.fields if f.name.lower() == "name"), None
        )
        if name_col is not None:
            for oid, nm in zip(rows["OBJECTID"], rows[name_col]):
                if nm is None:
                    continue
                names.append(str(nm))
                if str(nm).lower() == table.lower():
                    c = os.path.join(gdb_dir, f"a{int(oid):08x}.gdbtable")
                    if os.path.exists(c):
                        return c
    stems = sorted(
        f[: -len(".gdbtable")]
        for f in os.listdir(gdb_dir)
        if f.endswith(".gdbtable")
    )
    raise ValueError(
        f"table {table!r} not found in {gdb_dir}; catalog names: "
        f"{sorted(names)}; file stems: {stems}"
    )


def make_pure_gdb_reader():
    """Range reader for ``read_gdb`` backed by this module: no GDAL,
    no fiona. Signature: reader(gdb_dir, table, start, stop) →
    pandas DataFrame (geometry as WKT)."""

    def reader(gdb_dir: str, table: str, start: int, stop: int) -> pd.DataFrame:
        return GdbTable(resolve_table_file(gdb_dir, table)).read_rows(start, stop)

    return reader


def gdb_row_count(gdb_dir: str, table: str) -> int:
    """Valid-row count (the ``total_rows`` input to ``read_gdb``)."""
    return len(GdbTable(resolve_table_file(gdb_dir, table))._offsets)
