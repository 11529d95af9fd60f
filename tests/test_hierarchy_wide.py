"""Hierarchy resolve/rollup (GIE shape), the 2000-column VEA-width
melt, and catalog hull population."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_energy_data_server_spark.functions.geo import hull_from_table, parse_wkt_polygon
from open_energy_data_server_spark.functions.timeutil import quarter_hour_calendar_utc
from open_energy_data_server_spark.operators.hierarchy import resolve_path, rollup_to_parent
from open_energy_data_server_spark.operators.reshape import melt


@pytest.fixture()
def gie_levels(spark):
    countries = spark.createDataFrame(
        [("DE", None), ("AT", None)], "name string, parent string"
    )
    companies = spark.createDataFrame(
        [("uniper", "DE"), ("rag", "AT"), ("vng", "DE")], "name string, parent string"
    )
    locations = spark.createDataFrame(
        [
            ("rehden", "uniper", 100.0),
            ("etzel", "uniper", 50.0),
            ("haidach", "rag", 70.0),
            ("bernburg", "vng", 30.0),
        ],
        "name string, parent string, gasinstorage double",
    )
    return countries, companies, locations


def test_resolve_path(spark, gie_levels):
    countries, companies, locations = gie_levels
    out = resolve_path(
        [countries, companies, locations], level_names=["country", "company", "location"]
    )
    rows = {r.name: (r.company, r.country) for r in out.collect()}
    assert rows["rehden"] == ("uniper", "DE")
    assert rows["haidach"] == ("rag", "AT")
    assert rows["bernburg"] == ("vng", "DE")


def test_rollup_to_parent(spark, gie_levels):
    _, companies, locations = gie_levels
    per_company = rollup_to_parent(
        locations, "parent", [], [F.sum("gasinstorage").alias("gasinstorage")]
    )
    got = {r.name: r.gasinstorage for r in per_company.collect()}
    assert got == {"uniper": 150.0, "rag": 70.0, "vng": 30.0}
    # second rollup: company → country
    joined = per_company.join(
        companies.select(F.col("name"), F.col("parent").alias("country")), "name"
    )
    per_country = rollup_to_parent(
        joined, "country", [], [F.sum("gasinstorage").alias("gasinstorage")]
    )
    assert {r.name: r.gasinstorage for r in per_country.collect()} == {"DE": 180.0, "AT": 70.0}


def test_vea_width_melt(spark, tmp_path):
    """The 'genuinely hard' wide melt (SURVEY §7): 2001 value columns
    through chunked stack, joined onto the DST-aware quarter-hour
    calendar — the VEA ingest shape at F4 width. The wide frame goes
    through parquet first (like the real CSV landing) so each melt leg
    analyzes a scan, not a 2001-expression projection."""
    n_cols = 2001
    src = str(tmp_path / "wide")
    spark.range(5).select(
        F.col("id"),
        *[(F.col("id") * n_cols + i).cast("double").alias(f"time{i}") for i in range(n_cols)],
    ).coalesce(1).write.parquet(src)
    wide = spark.read.parquet(src)
    long = melt(
        wide,
        id_vars=["id"],
        var_name="slot",
        value_name="kwh",
        chunk_size=700,
    )
    # slot name → calendar position join (first 2001 slots of 2016)
    cal = (
        quarter_hour_calendar_utc(spark, 2016)
        .limit(n_cols)
        .withColumn("slot_idx", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy("ts_utc")
        ) - 1)
    )
    slots = long.withColumn("slot_idx", F.regexp_extract("slot", r"(\d+)", 1).cast("int"))
    joined = slots.join(F.broadcast(cal), "slot_idx")
    assert joined.count() == 5 * n_cols
    row0 = joined.filter((F.col("id") == 0) & (F.col("slot_idx") == 0)).collect()[0]
    # 2016-01-01 00:00 Berlin == 2015-12-31 23:00 UTC
    assert str(row0.ts_utc) == "2015-12-31 23:00:00"
    assert str(row0.ts_local) == "2016-01-01 00:00:00"


def test_hull_from_table(spark):
    pts = spark.createDataFrame(
        [(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0), (2.0, 1.5), (None, 1.0)],
        "lon double, lat double",
    )
    wkt = hull_from_table(pts, "lon", "lat")
    ring = parse_wkt_polygon(wkt)[0]
    assert set(map(tuple, ring[:-1])) == {(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)}
