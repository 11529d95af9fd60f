"""Legacy .xls (BIFF8 + CFB container) codec tests.

Same offline strategy as the 7z/xlsx codecs: the writer and reader are
independent walks of the public specs ([MS-CFB], [MS-XLS]), plus
hand-laid record bytes for the paths the writer doesn't emit (SST
CONTINUE splits, FILEPASS)."""

from __future__ import annotations

import struct

import pytest

from open_energy_data_server_spark.sources.cfb import CfbError, read_cfb, write_cfb
from open_energy_data_server_spark.sources.xls_codec import (
    XlsError,
    _decode_rk,
    _rec,
    parse_xls,
    write_xls,
)

ROWS = [
    ["name", "count", "ratio", "flag"],
    ["alpha", 42, 1.5, True],
    ["beta", -7, 2.25, False],
    ["gamma", None, 1e6, None],
]


def test_cfb_roundtrip_mini_and_regular_streams():
    small = b"tiny stream payload"
    big = bytes(range(256)) * 40  # 10240 B > 4096 → regular FAT chain
    got = read_cfb(write_cfb({"Workbook": small, "Blob": big}))
    assert got["Workbook"] == small
    assert got["Blob"] == big
    with pytest.raises(CfbError, match="magic"):
        read_cfb(b"PK\x03\x04 not ole")


def test_rk_encodings():
    assert _decode_rk((123 << 2) | 2) == 123
    assert _decode_rk(((-5 & 0x3FFFFFFF) << 2) | 2) == -5
    assert _decode_rk((123 << 2) | 3) == 1.23  # int ÷ 100
    # float RK: high 30 bits of the IEEE double for 2.5
    (bits,) = struct.unpack("<Q", struct.pack("<d", 2.5))
    assert _decode_rk((bits >> 32) & ~0x3) == 2.5


@pytest.mark.parametrize("pad", [False, True], ids=["ministream", "regular_fat"])
def test_parse_xls_roundtrip_types(pad):
    import pandas as pd

    pdf = parse_xls(write_xls({"Data": ROWS}, pad_to_regular=pad))
    assert list(pdf.columns) == ["name", "count", "ratio", "flag"]
    assert list(pdf["name"]) == ["alpha", "beta", "gamma"]
    # gap in the int column → float upcast with NaN, like pd.read_excel
    assert pdf.loc[0, "count"] == 42 and pdf.loc[1, "count"] == -7
    assert pd.isna(pdf.loc[2, "count"])
    assert pdf.loc[2, "ratio"] == 1e6
    assert pdf.loc[0, "flag"] is True and pdf.loc[1, "flag"] is False


def test_sheet_selection_and_skiprows():
    raw = write_xls(
        {
            "First": ROWS,
            "Zweite": [["junk"], ["k"], [99]],
        }
    )
    by_name = parse_xls(raw, sheet="Zweite", skiprows=1)
    by_idx = parse_xls(raw, sheet=1, skiprows=1)
    for pdf in (by_name, by_idx):
        assert list(pdf.columns) == ["k"]
        assert pdf.loc[0, "k"] == 99
    with pytest.raises(XlsError, match="no sheet named"):
        parse_xls(raw, sheet="Nope")


def test_sst_continue_split_mid_string():
    """An SST string split across a CONTINUE boundary, with the
    continuation re-specifying the encoding flag (compressed→wide) —
    the splice real writers emit for long tables."""
    # cells: A1 = sst[0] ("hello world"), B1 = sst[1] ("grüße")
    s0, s1 = "hello world", "grüße"
    part0 = struct.pack("<HB", len(s0), 0) + s0[:5].encode("latin-1")
    # CONTINUE: flag byte (1 = wide) + rest of s0 in UTF-16 + s1 entry
    part1 = (
        b"\x01"
        + s0[5:].encode("utf-16-le")
        + struct.pack("<HB", len(s1), 1)
        + s1.encode("utf-16-le")
    )
    book = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 1, 0))
    book += _rec(0x00FC, struct.pack("<II", 2, 2) + part0)
    book += _rec(0x003C, part1)
    nm = b"S"
    probe = _rec(0x0085, struct.pack("<IBB", 0, 0, 0) + bytes([1, 0]) + nm)
    sheet_pos = len(book) + len(probe) + 4  # after BOUNDSHEET + EOF
    book += _rec(0x0085, struct.pack("<IBB", sheet_pos, 0, 0) + bytes([1, 0]) + nm)
    book += _rec(0x000A, b"")
    book += _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 1, 0))
    book += _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))
    book += _rec(0x00FD, struct.pack("<HHHI", 0, 1, 0, 1))
    book += _rec(0x000A, b"")
    pdf = parse_xls(write_cfb({"Workbook": book}), header=False)
    assert list(pdf.iloc[0]) == ["hello world", "grüße"]


def test_encrypted_workbook_raises():
    book = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 1, 0))
    book += _rec(0x002F, b"\x01\x00")  # FILEPASS
    book += _rec(0x000A, b"")
    with pytest.raises(XlsError, match="encrypted"):
        parse_xls(write_cfb({"Workbook": book}))


def test_read_excel_dispatches_on_magic(spark, tmp_path):
    from open_energy_data_server_spark.sources.excel import read_excel

    p = tmp_path / "legacy.xls"
    p.write_bytes(write_xls({"Data": ROWS}))
    df = read_excel(spark, str(p))
    assert df.count() == 3
    assert {r.name for r in df.collect()} == {"alpha", "beta", "gamma"}


def test_read_excel_files_mixed_formats_distributed(spark, tmp_path):
    """One directory holding BOTH container formats scans through a
    single declared schema (the regelleistung corpus spans years of
    format drift)."""
    from tests.test_xlsx import SHARED, SHEET1, make_xlsx

    from open_energy_data_server_spark.sources.excel import read_excel_files

    d = tmp_path / "wb"
    d.mkdir()
    (d / "old.xls").write_bytes(
        write_xls({"Data": [["name", "count", "ratio"], ["delta", 1, 9.5]]})
    )
    (d / "new.xlsx").write_bytes(make_xlsx({"Data": SHEET1}, SHARED))
    df = read_excel_files(
        spark, str(d) + "/*", "name string, count double, ratio double",
        with_source=True,
    )
    rows = {r.source_file: (r.name, r.ratio) for r in df.collect() if r.name in ("delta", "alpha")}
    assert rows["old"] == ("delta", 9.5)
    assert rows["new"][0] == "alpha"


def test_corrupt_sst_odd_split_raises_not_hangs():
    """A wide SST fragment ending on an odd byte (splitting a UTF-16
    code unit) is corrupt per spec — must raise XlsError, not spin."""
    s = "wide"
    # header says 4 wide chars, but fragment carries 3 bytes of chars
    part0 = struct.pack("<HB", 4, 1) + s.encode("utf-16-le")[:3]
    part1 = b"\x01" + s.encode("utf-16-le")[3:]
    book = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 1, 0))
    book += _rec(0x00FC, struct.pack("<II", 1, 1) + part0)
    book += _rec(0x003C, part1)
    nm = b"S"
    probe = _rec(0x0085, struct.pack("<IBB", 0, 0, 0) + bytes([1, 0]) + nm)
    pos = len(book) + len(probe) + 4
    book += _rec(0x0085, struct.pack("<IBB", pos, 0, 0) + bytes([1, 0]) + nm)
    book += _rec(0x000A, b"")
    book += _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 1, 0))
    book += _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))
    book += _rec(0x000A, b"")
    with pytest.raises(XlsError, match="corrupt SST|truncated SST"):
        parse_xls(write_cfb({"Workbook": book}), header=False)
