"""Shapefile (.shp/.dbf) reader tests.

Fixture encoders are test-side and laid out octet-by-octet from the
public ESRI Shapefile Technical Description / dBase III format, so the
reader is verified against the format, not against itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from open_energy_data_server_spark.sources.shapefile import (
    parse_dbf,
    parse_shp,
    read_shapefile,
    read_shapefile_dir,
)


def _shp(records: list[bytes], shape_type: int) -> bytes:
    body = b""
    for i, content in enumerate(records, start=1):
        body += struct.pack(">ii", i, len(content) // 2) + content
    total_words = (100 + len(body)) // 2
    header = (
        struct.pack(">i", 9994)
        + b"\x00" * 20
        + struct.pack(">i", total_words)
        + struct.pack("<ii", 1000, shape_type)
        + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
    )
    return header + body


def _poly_content(rings: list[list[tuple[float, float]]], shape_type: int = 5) -> bytes:
    pts = [p for ring in rings for p in ring]
    parts, acc = [], 0
    for ring in rings:
        parts.append(acc)
        acc += len(ring)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return (
        struct.pack("<i", shape_type)
        + struct.pack("<4d", min(xs), min(ys), max(xs), max(ys))
        + struct.pack("<ii", len(rings), len(pts))
        + struct.pack(f"<{len(parts)}i", *parts)
        + b"".join(struct.pack("<dd", x, y) for x, y in pts)
    )


CW_SQUARE = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0)]
CCW_HOLE = [(2.0, 2.0), (6.0, 2.0), (6.0, 6.0), (2.0, 6.0), (2.0, 2.0)]


def _dbf(rows: list[tuple], deleted: set[int] = frozenset()) -> bytes:
    fields = [
        ("NAME", "C", 8, 0),
        ("POP", "N", 6, 0),
        ("AREA", "N", 8, 2),
        ("URBAN", "L", 1, 0),
    ]
    desc = b""
    for name, ftype, length, dec in fields:
        desc += (
            name.encode().ljust(11, b"\x00")
            + ftype.encode()
            + b"\x00" * 4
            + bytes([length, dec])
            + b"\x00" * 14
        )
    header_size = 32 + len(desc) + 1
    record_size = 1 + sum(f[2] for f in fields)
    head = (
        bytes([3, 24, 1, 2])
        + struct.pack("<IHH", len(rows), header_size, record_size)
        + b"\x00" * 20
    )
    body = b""
    for i, (name, pop, area, urban) in enumerate(rows, start=1):
        flag = b"*" if i in deleted else b" "
        body += (
            flag
            + name.encode().ljust(8)
            + str(pop).rjust(6).encode()
            + f"{area:.2f}".rjust(8).encode()
            + urban.encode()
        )
    return head + desc + b"\x0d" + body + b"\x1a"


def test_polygon_with_hole_to_wkt():
    raw = _shp([_poly_content([CW_SQUARE, CCW_HOLE])], shape_type=5)
    recs = parse_shp(raw)
    assert len(recs) == 1
    assert recs[0]["record"] == 1
    assert recs[0]["geometry"] == (
        "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), "
        "(2 2, 6 2, 6 6, 2 6, 2 2))"
    )


def test_two_shells_make_multipolygon():
    far = [(p[0] + 100, p[1]) for p in CW_SQUARE]
    raw = _shp([_poly_content([CW_SQUARE, far])], shape_type=5)
    wkt = parse_shp(raw)[0]["geometry"]
    assert wkt.startswith("MULTIPOLYGON (((0 0, ")
    assert "((100 0, " in wkt


def test_point_polyline_multipoint_null():
    pt = struct.pack("<idd", 1, 3.5, -4.25)
    line = _poly_content([[(0.0, 0.0), (1.0, 1.0)], [(5.0, 5.0), (6.0, 7.0)]], 3)
    mp = struct.pack("<i", 8) + struct.pack("<4d", 0, 0, 2, 2) + struct.pack(
        "<i", 2
    ) + struct.pack("<4d", 0.0, 0.5, 2.0, 1.5)
    null = struct.pack("<i", 0)
    recs = parse_shp(_shp([pt, line, mp, null], shape_type=1))
    assert recs[0]["geometry"] == "POINT (3.5 -4.25)"
    assert recs[1]["geometry"] == "MULTILINESTRING ((0 0, 1 1), (5 5, 6 7))"
    assert recs[2]["geometry"] == "MULTIPOINT (0 0.5, 2 1.5)"
    assert recs[3]["geometry"] is None


def test_dbf_types_and_deleted_rows():
    raw = _dbf(
        [("Aachen", 250000, 160.85, "T"), ("Borken", 42000, 59.25, "F"),
         ("Gone", 1, 1.0, "?")],
        deleted={3},
    )
    rows = parse_dbf(raw)
    assert len(rows) == 2
    assert rows[0] == {
        "record": 1, "NAME": "Aachen", "POP": 250000, "AREA": 160.85, "URBAN": True,
    }
    assert rows[1]["URBAN"] is False


def test_read_shapefile_with_attributes_roundtrip(spark, tmp_path):
    """End-to-end S10: .shp+.dbf → WKT DataFrame → the engine's own
    point-in-polygon (hole excluded) — the nuts_mapper ingest shape."""
    from open_energy_data_server_spark.functions.geo import (
        parse_wkt_polygon,
        points_in_polygon,
    )

    shp = tmp_path / "nuts.shp"
    dbf = tmp_path / "nuts.dbf"
    shp.write_bytes(_shp([_poly_content([CW_SQUARE, CCW_HOLE])], 5))
    dbf.write_bytes(_dbf([("Aachen", 250000, 160.85, "T")]))
    df = read_shapefile(spark, str(shp), str(dbf))
    row = df.collect()[0]
    assert row["NAME"] == "Aachen" and row["POP"] == 250000
    rings = parse_wkt_polygon(row["geometry"])
    x = np.array([1.0, 4.0, 11.0])
    y = np.array([1.0, 4.0, 11.0])
    assert points_in_polygon(rings, x, y).tolist() == [True, False, False]


def test_read_shapefile_dir_distributed(spark, tmp_path):
    d = tmp_path / "shp"
    d.mkdir()
    (d / "a.shp").write_bytes(_shp([_poly_content([CW_SQUARE])], 5))
    (d / "b.shp").write_bytes(
        _shp([struct.pack("<idd", 1, 1.0, 2.0), struct.pack("<idd", 1, 3.0, 4.0)], 1)
    )
    df = read_shapefile_dir(spark, str(d) + "/*.shp")
    rows = {(r.path, r.record): r.geometry for r in df.collect()}
    assert rows[("a", 1)].startswith("POLYGON ((0 0, ")
    assert rows[("b", 2)] == "POINT (3 4)"
    assert len(rows) == 3


def test_bad_file_code_raises():
    with pytest.raises(ValueError, match="file code"):
        parse_shp(b"\x00" * 100)


def test_read_dbf_dir_joins_to_shapes(spark, tmp_path):
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.sources.shapefile import read_dbf_dir

    d = tmp_path / "gdb"
    d.mkdir()
    (d / "a.shp").write_bytes(_shp([_poly_content([CW_SQUARE])], 5))
    (d / "a.dbf").write_bytes(_dbf([("Aachen", 250000, 160.85, "T")]))
    (d / "b.shp").write_bytes(_shp([struct.pack("<idd", 1, 1.0, 2.0)], 1))
    (d / "b.dbf").write_bytes(_dbf([("Borken", 42000, 59.25, "F")]))
    shapes = read_shapefile_dir(spark, str(d) + "/*.shp")
    attrs = read_dbf_dir(spark, str(d) + "/*.dbf")
    names = attrs.filter(F.col("field") == "NAME")
    joined = shapes.join(names, ["path", "record"])
    got = {r.path: (r.value, r.geometry.split(" ")[0]) for r in joined.collect()}
    assert got == {"a": ("Aachen", "POLYGON"), "b": ("Borken", "POINT")}


def test_read_gdb_distributed_slices(spark, tmp_path):
    """S10 GDB seam: a fixed-width binary fixture stands in for the
    OpenFileGDB table; the injected range reader decodes one slice per
    task. Verifies slice math (uneven tail), full-row coverage through
    the distributed path, WKT geometry, and one-partition-per-slice."""
    import numpy as np
    import pandas as pd

    from open_energy_data_server_spark.sources.shapefile import read_gdb

    # fixture "gdb": 10007 records of (<q id, <d heat_density) — the
    # NRW heat-density table shape (id, kwp, geometry)
    n = 10_007
    payload = b"".join(struct.pack("<qd", i, i * 0.5) for i in range(n))
    gdb = tmp_path / "nrw.gdb"
    gdb.mkdir()
    (gdb / "a00000001.gdbtable").write_bytes(payload)
    table_path = str(gdb / "a00000001.gdbtable")

    def reader(gdb_dir, table, start, stop):
        with open(table_path, "rb") as f:  # Struct objects don't pickle
            raw = f.read()
        rows = [struct.unpack_from("<qd", raw, i * 16) for i in range(start, stop)]
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        heat = np.array([r[1] for r in rows])
        return pd.DataFrame(
            {
                "id": ids,
                "heat_density": heat,
                "geometry": [f"POINT ({i % 100} {i // 100})" for i in ids],
            }
        )

    df = read_gdb(
        spark,
        str(gdb),
        "waermedichte",
        reader,
        total_rows=n,
        schema="id long, heat_density double, geometry string",
        rows_per_task=1000,
    )
    assert df.rdd.getNumPartitions() == 11  # ceil(10007/1000) slices
    # true 1:1 slice→task layout (range partitioning — hash would
    # birthday-collide slices into shared tasks)
    sizes = sorted(len(p) for p in df.rdd.glom().collect())
    assert sizes == [7] + [1000] * 10
    assert df.count() == n
    got = df.filter("id IN (0, 9999, 10006)").orderBy("id").collect()
    assert [r.id for r in got] == [0, 9999, 10006]
    assert got[1].heat_density == 9999 * 0.5
    assert got[2].geometry == "POINT (6 100)"


def test_read_gdb_validates_and_default_reader_gated(spark):
    from open_energy_data_server_spark.sources.shapefile import (
        make_fiona_gdb_reader,
        read_gdb,
    )

    with pytest.raises(ValueError, match="total_rows"):
        read_gdb(spark, "/nope.gdb", "t", lambda *a: None, 0, "id long")
    with pytest.raises(ValueError, match="inject reader"):
        make_fiona_gdb_reader()  # fiona absent in this container
