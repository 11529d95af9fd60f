"""Pure OpenFileGDB decoder tests.

The fixture writer below is test-side and lays out the .gdbtable /
.gdbtablx octets directly from the public reverse-engineered FileGDB
spec (header → field descriptors → null-bitmapped row blobs; LEB128
varuints; signed varints with the sign in bit 6 of the first byte;
delta-quantized geometry), so the decoder is verified against the
format, not against itself.
"""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from open_energy_data_server_spark.sources.gdbtable import (
    GdbTable,
    gdb_row_count,
    make_pure_gdb_reader,
    read_varint,
    read_varuint,
)


def w_varuint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def w_varint(v: int) -> bytes:
    sign = 0x40 if v < 0 else 0
    v = abs(v)
    first = (v & 0x3F) | sign
    v >>= 6
    out = bytearray()
    if v:
        out.append(first | 0x80)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    else:
        out.append(first)
    return bytes(out)


def _utf16_name(s: str) -> bytes:
    return bytes([len(s)]) + s.encode("utf-16-le")


XORIGIN, YORIGIN, XYSCALE = -400.0, -400.0, 1000.0


def _geom_field(name: str) -> bytes:
    return (
        _utf16_name(name)
        + _utf16_name("")
        + bytes([7])  # geometry
        + bytes([0])  # constant
        + bytes([1])  # flag: nullable
        + struct.pack("<h", 0)  # srs length 0
        + bytes([1])  # flags3: 2D
        + struct.pack("<3d", XORIGIN, YORIGIN, XYSCALE)  # origin + scale
        + struct.pack("<d", 0.001)  # xytolerance
        + struct.pack("<4d", 0.0, 0.0, 100.0, 100.0)  # bbox
        + bytes([0])  # pad
        + w_varuint(1)  # one spatial grid size
        + struct.pack("<d", 4.0)
    )


def _poly_blob(rings: list[list[tuple[float, float]]]) -> bytes:
    n_points = sum(len(r) for r in rings)
    q = lambda v, o: round((v - o) * XYSCALE)  # noqa: E731
    xs = [q(x, XORIGIN) for r in rings for x, _ in r]
    ys = [q(y, YORIGIN) for r in rings for _, y in r]
    out = bytearray()
    out += w_varuint(5)  # polygon
    out += w_varuint(n_points)
    out += w_varuint(len(rings))
    out += w_varuint(min(xs)) + w_varuint(min(ys))
    out += w_varuint(max(xs) - min(xs)) + w_varuint(max(ys) - min(ys))
    for r in rings[:-1]:
        out += w_varuint(len(r))
    ix = iy = 0
    for x, y in zip(xs, ys):
        out += w_varint(x - ix) + w_varint(y - iy)
        ix, iy = x, y
    return bytes(out)


def write_fixture_gdb(
    dirpath, rows: list[tuple], deleted: set[int] = frozenset(), stem="a00000004"
):
    """rows: (kwp int32, heat float64|None, name str|None, geom_rings|None).
    Fields: OBJECTID (implicit) + 3 nullable attrs + nullable geometry."""
    fields = (
        _utf16_name("OBJECTID") + _utf16_name("") + bytes([6, 4, 2])
        + _utf16_name("kwp") + _utf16_name("") + bytes([1, 4, 1])  # int32 nullable
        + _utf16_name("heat") + _utf16_name("") + bytes([3, 8, 1])  # f64 nullable
        + _utf16_name("name") + _utf16_name("")
        + bytes([4]) + struct.pack("<i", 255) + bytes([1])  # string nullable
        + _geom_field("SHAPE")
    )
    body = struct.pack("<i", 4) + bytes([4, 3, 0, 0]) + struct.pack(
        "<h", 5
    ) + fields
    field_section = struct.pack("<i", len(body)) + body

    blobs = []
    for kwp, heat, name, rings in rows:
        nulls = 0
        payload = bytearray()
        if kwp is None:
            nulls |= 1
        else:
            payload += struct.pack("<i", kwp)
        if heat is None:
            nulls |= 2
        else:
            payload += struct.pack("<d", heat)
        if name is None:
            nulls |= 4
        else:
            enc = name.encode("utf-8")
            payload += w_varuint(len(enc)) + enc
        if rings is None:
            nulls |= 8
        else:
            g = _poly_blob(rings)
            payload += w_varuint(len(g)) + g
        blob = bytes([nulls]) + bytes(payload)
        blobs.append(struct.pack("<i", len(blob)) + blob)

    header_len = 40
    row0 = header_len + len(field_section)
    offsets, pos = [], row0
    for i, b in enumerate(blobs):
        offsets.append(0 if i in deleted else pos)
        pos += len(b)
    table = (
        struct.pack("<6i", 3, len(rows) - len(deleted), 0, 5, 0, 0)
        + struct.pack("<q", pos)
        + struct.pack("<q", header_len)
        + field_section
        + b"".join(blobs)
    )
    (dirpath / f"{stem}.gdbtable").write_bytes(table)

    osize = 5
    n_blocks = (len(rows) + 1023) // 1024
    x = struct.pack("<4i", 3, n_blocks, len(rows), osize)
    ents = bytearray()
    for i in range(n_blocks * 1024):
        off = offsets[i] if i < len(offsets) else 0
        ents += off.to_bytes(osize, "little")
    (dirpath / f"{stem}.gdbtablx").write_bytes(x + bytes(ents))


SQUARE = [[(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]]
HOLEY = [
    [(0.0, 0.0), (0.0, 8.0), (8.0, 8.0), (8.0, 0.0), (0.0, 0.0)],
    [(2.0, 2.0), (2.0, 3.0), (3.0, 3.0), (3.0, 2.0), (2.0, 2.0)],
]


def test_varint_codecs_roundtrip():
    for v in (0, 1, 63, 64, 127, 128, 300, 2**21, 2**40):
        assert read_varuint(w_varuint(v), 0)[0] == v
    for v in (0, 1, -1, 63, -63, 64, -64, 4095, -4096, 2**30, -(2**30)):
        assert read_varint(w_varint(v), 0)[0] == v


def test_gdbtable_values_nulls_geometry(tmp_path):
    rows = [
        (10, 1.5, "Aachen", SQUARE),
        (None, None, None, None),  # all-null row
        (30, -2.25, "Köln", HOLEY),
    ]
    write_fixture_gdb(tmp_path, rows)
    t = GdbTable(str(tmp_path / "a00000004.gdbtable"))
    assert [f.name for f in t.fields] == ["OBJECTID", "kwp", "heat", "name", "SHAPE"]
    df = t.read_rows(0, 3)
    assert df["OBJECTID"].tolist() == [1, 2, 3]
    assert df["kwp"].tolist() == [10, None, 30]
    assert df["heat"].tolist() == [1.5, None, -2.25]
    assert df["name"].tolist() == ["Aachen", None, "Köln"]
    assert df["SHAPE"][0] == (
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"
    )
    assert df["SHAPE"][1] is None
    assert df["SHAPE"][2] == (
        "POLYGON ((0 0, 0 8, 8 8, 8 0, 0 0), (2 2, 2 3, 3 3, 3 2, 2 2))"
    )


def test_gdbtable_deleted_rows_and_slicing(tmp_path):
    rows = [(i, float(i), f"r{i}", SQUARE) for i in range(10)]
    write_fixture_gdb(tmp_path, rows, deleted={3, 7})
    path = str(tmp_path / "a00000004.gdbtable")
    t = GdbTable(path)
    assert gdb_row_count(str(tmp_path), "a00000004") == 8
    got = t.read_rows(0, 100)["kwp"].tolist()
    assert got == [0, 1, 2, 4, 5, 6, 8, 9]  # deleted rows skipped
    assert t.read_rows(2, 5)["kwp"].tolist() == [2, 4, 5]


def test_read_gdb_distributed_pure_decoder(spark, tmp_path):
    """The round-6 'done' bar: a 10k-row GDB fixture decodes through
    read_gdb's distributed slice path with NO fiona import, matching
    the reference's chunked semantics
    (nrw_kwp_waermedichte.py:61-76)."""
    from open_energy_data_server_spark.sources.shapefile import read_gdb

    n = 10_007
    gdb = tmp_path / "nrw.gdb"
    gdb.mkdir()
    write_fixture_gdb(
        gdb, [(i, i * 0.5, None, SQUARE if i % 2 else None) for i in range(n)]
    )
    total = gdb_row_count(str(gdb), "a00000004")
    assert total == n
    df = read_gdb(
        spark,
        str(gdb),
        "a00000004",
        reader=make_pure_gdb_reader(),
        total_rows=total,
        schema="OBJECTID long, kwp long, heat double, name string, SHAPE string",
        rows_per_task=1000,
    )
    assert df.rdd.getNumPartitions() == 11
    assert df.count() == n
    got = df.filter("kwp IN (0, 9999, 10006)").orderBy("kwp").collect()
    assert [r.kwp for r in got] == [0, 9999, 10006]
    assert got[1].heat == 9999 * 0.5
    assert got[1].SHAPE == "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"
    assert got[0].SHAPE is None


def test_gdbtable_rejects_garbage(tmp_path):
    (tmp_path / "x.gdbtable").write_bytes(b"\x07" + b"\x00" * 60)
    with pytest.raises(ValueError, match="missing row index"):
        GdbTable(str(tmp_path / "x.gdbtable"))
    (tmp_path / "x.gdbtablx").write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError, match="magic 7"):
        GdbTable(str(tmp_path / "x.gdbtable"))


def test_gdbtable_compressed_variant_fails_loudly(tmp_path):
    """A non-magic-3 .gdbtable (the proprietary compressed CDF layout)
    must fail with an error that names the cause and the fiona/SDK
    injection seam, not a generic parse error."""
    import struct as _struct

    (tmp_path / "c.gdbtable").write_bytes(
        _struct.pack("<i", 9) + b"\x00" * 60
    )
    (tmp_path / "c.gdbtablx").write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError, match="compressed-geodatabase.*reader="):
        GdbTable(str(tmp_path / "c.gdbtable"))


def test_datetime_field_decodes(tmp_path):
    """datetime = float64 days since 1899-12-30 (the Access/Excel
    epoch the FileGDB spec documents)."""
    # minimal single-field table: OBJECTID + datetime
    fields = (
        _utf16_name("OBJECTID") + _utf16_name("") + bytes([6, 4, 2])
        + _utf16_name("ts") + _utf16_name("") + bytes([5, 8, 1])
    )
    body = struct.pack("<i", 4) + bytes([0, 3, 0, 0]) + struct.pack(
        "<h", 2
    ) + fields
    sec = struct.pack("<i", len(body)) + body
    blob = bytes([0]) + struct.pack("<d", 45000.5)  # 2023-03-15 12:00
    row = struct.pack("<i", len(blob)) + blob
    row0 = 40 + len(sec)
    table = (
        struct.pack("<6i", 3, 1, 0, 5, 0, 0)
        + struct.pack("<q", row0 + len(row))
        + struct.pack("<q", 40)
        + sec
        + row
    )
    (tmp_path / "a00000002.gdbtable").write_bytes(table)
    x = struct.pack("<4i", 3, 1, 1, 5) + row0.to_bytes(5, "little") + b"\x00" * (
        5 * 1023
    )
    (tmp_path / "a00000002.gdbtablx").write_bytes(x)
    df = GdbTable(str(tmp_path / "a00000002.gdbtable")).read_rows(0, 1)
    assert df["ts"][0] == pd.Timestamp("1899-12-30") + pd.Timedelta(days=45000.5)


def test_read_gdb_zero_config_infers_schema_and_count(spark, tmp_path):
    """reader=None: pure decoder + schema/row-count inferred from the
    .gdbtable field descriptors and .gdbtablx index."""
    from open_energy_data_server_spark.sources.shapefile import read_gdb

    gdb = tmp_path / "x.gdb"
    gdb.mkdir()
    write_fixture_gdb(
        gdb, [(i, i * 2.0, f"n{i}", SQUARE) for i in range(25)], deleted={5}
    )
    df = read_gdb(spark, str(gdb), "a00000004", rows_per_task=10)
    assert [f.name for f in df.schema.fields] == [
        "OBJECTID", "kwp", "heat", "name", "SHAPE",
    ]
    assert [str(f.dataType) for f in df.schema.fields] == [
        "LongType()", "IntegerType()", "DoubleType()", "StringType()",
        "StringType()",
    ]
    assert df.count() == 24
    rows = {r.kwp: r for r in df.collect()}
    assert 5 not in rows
    assert rows[7].heat == 14.0 and rows[7].name == "n7"
    assert rows[7].SHAPE.startswith("POLYGON ((0 0, 0 10")


def test_objectid_survives_deleted_gaps(tmp_path):
    """Implicit OBJECTID is the .gdbtablx POSITION, not the live-row
    index — deleted rows leave numbering gaps, exactly like ArcGIS."""
    write_fixture_gdb(
        tmp_path, [(i, float(i), None, None) for i in range(6)], deleted={1, 3}
    )
    df = GdbTable(str(tmp_path / "a00000004.gdbtable")).read_rows(0, 10)
    assert df["OBJECTID"].tolist() == [1, 3, 5, 6]
    assert df["kwp"].tolist() == [0, 2, 4, 5]


def test_resolve_by_layer_name_via_system_catalog(spark, tmp_path):
    """The reference opens its table by NAME (fiona layer=...): the
    a00000001 GDB_SystemCatalog maps Name → OBJECTID n → file a%08x."""
    import struct as _s

    from open_energy_data_server_spark.sources.gdbtable import (
        resolve_table_file,
    )
    from open_energy_data_server_spark.sources.shapefile import read_gdb

    gdb = tmp_path / "nrw.gdb"
    gdb.mkdir()
    # catalog: OBJECTID + Name; row 4 names the data table
    fields = (
        _utf16_name("OBJECTID") + _utf16_name("") + bytes([6, 4, 2])
        + _utf16_name("Name") + _utf16_name("")
        + bytes([4]) + _s.pack("<i", 160) + bytes([1])
    )
    body = _s.pack("<i", 4) + bytes([0, 3, 0, 0]) + _s.pack("<h", 2) + fields
    sec = _s.pack("<i", len(body)) + body
    blobs = []
    for nm in ("GDB_SystemCatalog", "GDB_DBTune", "GDB_SpatialRefs",
               "waermedichte"):
        enc = nm.encode("utf-8")
        blob = bytes([0]) + w_varuint(len(enc)) + enc
        blobs.append(_s.pack("<i", len(blob)) + blob)
    row0 = 40 + len(sec)
    offs, pos = [], row0
    for b in blobs:
        offs.append(pos)
        pos += len(b)
    (gdb / "a00000001.gdbtable").write_bytes(
        _s.pack("<6i", 3, 4, 0, 5, 0, 0) + _s.pack("<q", pos)
        + _s.pack("<q", 40) + sec + b"".join(blobs)
    )
    x = _s.pack("<4i", 3, 1, 4, 5) + b"".join(
        o.to_bytes(5, "little") for o in offs
    ) + b"\x00" * (5 * 1020)
    (gdb / "a00000001.gdbtablx").write_bytes(x)

    write_fixture_gdb(gdb, [(i, i * 1.0, None, SQUARE) for i in range(7)])

    assert resolve_table_file(str(gdb), "waermedichte").endswith(
        "a00000004.gdbtable"
    )
    assert resolve_table_file(str(gdb), "WaermeDichte").endswith(
        "a00000004.gdbtable"
    )
    with pytest.raises(ValueError, match="catalog names"):
        resolve_table_file(str(gdb), "nope")
    df = read_gdb(spark, str(gdb), "waermedichte", rows_per_task=3)
    assert df.count() == 7
