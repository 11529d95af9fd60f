"""Pure-Python 7z codec tests (SURVEY S6).

The writer and reader are independent implementations of the public
7zFormat.txt layout (like the GRIB2/xlsx codecs, the format knowledge —
variable-length numbers, property trees, folder/substream split — is
exercised from both directions plus hand-laid spec bytes).
"""

from __future__ import annotations

import io

import pytest

from open_energy_data_server_spark.sources.sevenzip import (
    SevenZipError,
    _Reader,
    _num,
    is_7z,
    read_7z,
    write_7z,
)

FILES = {
    "house_1.csv": b"Time,Appliance1\n" + b"2015-01-01 00:00:00,42\n" * 50,
    "house_2.csv": b"Time,Appliance1\n" + b"2015-01-01 00:00:00,7\n" * 80,
    "readme.txt": b"REFIT processed data",
}


def test_number_codec_spec_forms():
    # writer forms round-trip
    for v in (0, 1, 0x7F, 0x80, 0x1234, 2**31, 2**56 + 5):
        assert _Reader(_num(v)).num() == v
    # spec multi-byte form not emitted by our writer: 0x81 0x23 → 0x123
    assert _Reader(bytes([0x81, 0x23])).num() == 0x123
    # 0xC0-prefixed: first two mask bits set → two extension bytes
    assert _Reader(bytes([0xC0, 0x34, 0x12])).num() == 0x1234


@pytest.mark.parametrize("codec", ["copy", "lzma1", "lzma2"])
def test_roundtrip_solid_multifile(codec):
    raw = write_7z(FILES, codec=codec)
    assert is_7z(raw)
    got = read_7z(raw)
    assert got == FILES
    assert list(got) == list(FILES)  # member order preserved


def test_roundtrip_encoded_header():
    """The 7z CLI compresses the header itself (kEncodedHeader 0x17) —
    the reader must decode the header folder before parsing it."""
    raw = write_7z(FILES, codec="lzma1", encoded_header=True)
    # encoded header must actually be in effect: the plain-text member
    # name may not appear verbatim in the archive tail
    assert "house_1".encode("utf-16-le") not in raw
    assert read_7z(raw) == FILES


def test_empty_members_via_bit_vectors():
    files = {"a.csv": b"x,y\n1,2\n", "empty.txt": b"", "b.csv": b"q\n9\n"}
    got = read_7z(write_7z(files, codec="lzma1"))
    assert got == files


def test_crc_mismatch_raises():
    raw = bytearray(write_7z(FILES, codec="copy"))
    # flip a byte inside the packed payload region (after the 32-byte
    # signature header, before the trailing next-header)
    raw[40] ^= 0xFF
    with pytest.raises(SevenZipError, match="CRC"):
        read_7z(bytes(raw))


def test_bad_signature_and_unsupported_coder():
    with pytest.raises(SevenZipError, match="signature"):
        read_7z(b"PK\x03\x04 not a 7z")
    raw = bytearray(write_7z({"f": b"data"}, codec="copy"))
    # corrupt the coder id (0x00 Copy → 0x05) inside the plain header:
    # kFolder, nfolders=1, external=0, ncoders=1, flag=0x01, cid=0x00
    idx = bytes(raw).rindex(bytes([0x0B, 0x01, 0x00, 0x01, 0x01, 0x00]))
    raw[idx + 5] = 0x05  # unknown coder 0x05
    # fix the next-header CRC so the coder error (not CRC) surfaces
    import struct
    import zlib

    nh_off, nh_size = struct.unpack("<QQ", raw[12:28])
    raw[28:32] = struct.pack("<I", zlib.crc32(bytes(raw[32 + nh_off:32 + nh_off + nh_size])))
    raw[8:12] = struct.pack("<I", zlib.crc32(bytes(raw[12:32])))
    with pytest.raises(SevenZipError, match="unsupported 7z coder"):
        read_7z(bytes(raw))


def test_landing_unpacks_7z_and_spark_reads_members(spark, tmp_path):
    """S6 end-to-end, mirroring the REFIT crawler
    (/root/reference/crawler/refit.py:51-61): land a .7z of per-house
    CSVs, read the extracted directory with Spark, one file per house."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.sources.landing import land

    src = tmp_path / "refit.7z"
    csvs = {k: v for k, v in FILES.items() if k.endswith(".csv")}
    src.write_bytes(write_7z(csvs, codec="lzma1", encoded_header=True))

    out_dir = land(str(src), str(tmp_path / "landing"), "refit.7z")
    df = (
        spark.read.option("header", True)
        .csv(f"{out_dir}/*.csv")
        .withColumn("house", F.regexp_extract(F.input_file_name(), r"(house_\d+)", 1))
    )
    counts = {r["house"]: r["n"] for r in df.groupBy("house").agg(F.count("*").alias("n")).collect()}
    assert counts == {"house_1": 50, "house_2": 80}


def test_landing_rejects_path_traversal_member(tmp_path):
    """A fetched 7z is untrusted: a member named '../evil' must raise,
    not write outside the extraction dir."""
    from open_energy_data_server_spark.sources.landing import land

    src = tmp_path / "evil.7z"
    src.write_bytes(write_7z({"../../evil.txt": b"pwned"}, codec="copy"))
    with pytest.raises(ValueError, match="escapes extraction dir"):
        land(str(src), str(tmp_path / "landing"), "evil.7z")
    assert not (tmp_path / "evil.txt").exists()
