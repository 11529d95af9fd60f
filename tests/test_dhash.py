"""Unit tests for the dHash perceptual near-dup operators
(operators/multimodal.py): hash semantics, band pigeonhole recall,
and the banded pair search."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.multimodal import (
    DHASH_BITS,
    dhash_bands,
    dhash_bits,
    dhash_neardup_pairs,
)


def _grid(rows: list[str]) -> str:
    assert len(rows) == 6 and all(len(r) == 11 for r in rows)
    return "".join(rows)


def test_dhash_bit_semantics(spark):
    # strictly increasing bytes -> every comparison true -> all 60 bits
    inc = _grid(["ABCDEFGHIJK"] * 6)
    dec = _grid(["KJIHGFEDCBA"] * 6)
    df = spark.createDataFrame([(1, inc), (2, dec)], "id bigint, g string")
    out = {r["id"]: r["h"] for r in df.select("id", dhash_bits(F.col("g")).alias("h")).collect()}
    assert out[1] == (1 << DHASH_BITS) - 1
    assert out[2] == 0


def test_dhash_bands_reassemble(spark):
    g = _grid(["AKBJCIDHEGF"] * 6)
    df = spark.createDataFrame([(1, g)], "id bigint, g string")
    row = df.select(
        dhash_bits(F.col("g")).alias("h"), *dhash_bands(dhash_bits(F.col("g")))
    ).collect()[0]
    assert (
        row["band0"]
        | (row["band1"] << 15)
        | (row["band2"] << 30)
        | (row["band3"] << 45)
    ) == row["h"]


def test_dhash_pairs_find_near_duplicate(spark):
    base = _grid(["ABCDEFGHIJK"] * 6)
    # flip two comparisons in one band (swap two adjacent bytes in row 0)
    near = "ACBDEFGHIJK" + base[11:]
    far = _grid(["KJIHGFEDCBA"] * 6)
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id bigint, g string"
    ).select("id", dhash_bits(F.col("g")).alias("h"))
    pairs = dhash_neardup_pairs(df, "id", "h", max_hamming=3).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert (1, 2) in got and 1 <= got[(1, 2)] <= 3
    assert all(k == (1, 2) for k in got)


def test_dhash_pairs_no_quadratic_blowup(spark):
    # disjoint hashes share no band -> zero candidates, not n^2 scan
    df = spark.createDataFrame(
        [(i, i * 0x1111111111) for i in range(1, 30)], "id bigint, h bigint"
    )
    assert dhash_neardup_pairs(df, "id", "h", max_hamming=1).count() == 0
