"""Tests for parquet MERGE emulation and skew utilities."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.merge import merge_dataframes, merge_upsert
from open_energy_data_server_spark.operators.skew import (
    salted_broadcast_left,
    salted_groupby,
)
from open_energy_data_server_spark.sinks.writer import read_table_or_none


def test_merge_dataframes(spark):
    target = spark.createDataFrame([(1, "old", 1), (2, "keep", 1)], "k long, v string, ver int")
    updates = spark.createDataFrame(
        [(1, "newer", 3), (1, "new", 2), (3, "ins", 1)], "k long, v string, ver int"
    )
    out = {r.k: r.v for r in merge_dataframes(target, updates, ["k"], "ver").collect()}
    assert out == {1: "newer", 2: "keep", 3: "ins"}


def test_merge_upsert_roundtrip(spark, tmp_path):
    lake = str(tmp_path / "lake")
    b1 = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "k long, v string, ver int")
    n1 = merge_upsert(spark, lake, "s", "dim", b1, ["k"], "ver")
    assert n1 == 2
    b2 = spark.createDataFrame([(2, "b2", 2), (3, "c", 1)], "k long, v string, ver int")
    n2 = merge_upsert(spark, lake, "s", "dim", b2, ["k"], "ver")
    assert n2 == 3
    out = {r.k: r.v for r in read_table_or_none(spark, lake, "s", "dim").collect()}
    assert out == {1: "a", 2: "b2", 3: "c"}


def test_merge_upsert_partition_scoped(spark, tmp_path):
    """Dynamic partition overwrite must leave untouched partitions'
    files alone (O(changed partitions), not O(table))."""
    import os

    lake = str(tmp_path / "lake")
    b1 = spark.createDataFrame(
        [(1, "2024-01-01", "a"), (2, "2024-01-02", "b")], "k long, d string, v string"
    )
    merge_upsert(spark, lake, "s", "t", b1, ["k"], partition_col="d")
    p1 = os.path.join(lake, "s", "t", "d=2024-01-01")
    mtime_before = max(os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1))

    b2 = spark.createDataFrame([(2, "2024-01-02", "b2")], "k long, d string, v string")
    merge_upsert(spark, lake, "s", "t", b2, ["k"], partition_col="d")
    mtime_after = max(os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1))
    assert mtime_after == mtime_before  # partition 01-01 not rewritten

    out = {r.k: r.v for r in read_table_or_none(spark, lake, "s", "t").collect()}
    assert out == {1: "a", 2: "b2"}


def test_salted_groupby_matches_plain(spark):
    df = spark.createDataFrame(
        [("DE", float(i)) for i in range(1000)] + [("AT", 1.0), ("AT", 2.0)],
        "country string, v double",
    )
    salted = salted_groupby(
        df,
        ["country"],
        partial_aggs=[F.count(F.lit(1)).alias("n"), F.max("v").alias("mx")],
        final_aggs=[F.sum("n").alias("n"), F.max("mx").alias("mx")],
    )
    got = {r.country: (r.n, r.mx) for r in salted.collect()}
    assert got == {"DE": (1000, 999.0), "AT": (2, 2.0)}


def test_salted_broadcast_left(spark):
    fact = spark.createDataFrame(
        [("DE", i) for i in range(500)] + [("AT", 0)], "country string, x int"
    )
    dim = spark.createDataFrame([("DE", "Germany"), ("AT", "Austria")], "country string, name string")
    out = salted_broadcast_left(fact, dim, "country")
    assert out.count() == 501
    assert out.filter(F.col("name").isNull()).count() == 0
    assert out.filter((F.col("country") == "AT") & (F.col("name") == "Austria")).count() == 1
