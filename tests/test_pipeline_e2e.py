"""End-to-end crawl simulation: the full §3.1 lifecycle over the
engine — land a zipped locale CSV, parse/normalize, incremental
dedup write, watermark resume on the second crawl, catalog upsert,
and per-pipeline failure isolation."""

from __future__ import annotations

import zipfile

from pyspark.sql import functions as F

from open_energy_data_server_spark.catalog import read_metadata
from open_energy_data_server_spark.pipeline import Pipeline, run_all
from open_energy_data_server_spark.sinks.writer import read_table_or_none
from open_energy_data_server_spark.sources.csv_locale import CsvDialect, read_locale_csv
from open_energy_data_server_spark.sources.landing import land

CSV_BATCH1 = (
    "Zeitstempel;Anlage;Erzeugung (MWh)\n"
    "2024-03-01 00:00:00;wind;1.234,5\n"
    "2024-03-01 00:15:00;wind;1.300,0\n"
    "2024-03-01 00:15:00;wind;9.999,9\n"  # duplicate key — keep first
    "2024-03-01 00:00:00;solar;N.A.\n"
)
CSV_BATCH2 = (
    "Zeitstempel;Anlage;Erzeugung (MWh)\n"
    "2024-03-01 00:15:00;wind;7.777,7\n"  # older than watermark → skipped
    "2024-03-01 00:30:00;wind;1.400,25\n"
    "2024-03-01 00:30:00;solar;2,5\n"
)


def _make_pipeline(spark, tmp_path, batch_csv, name):
    src = tmp_path / f"{name}.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("gen.csv", batch_csv)
    landed = land(str(src), str(tmp_path / "landing"), f"{name}.zip")

    def read(s):
        df = read_locale_csv(
            s, landed, CsvDialect(numeric_columns=["Erzeugung (MWh)"])
        )
        return df

    def transform(df):
        return df.select(
            F.to_timestamp("zeitstempel").alias("ts"),
            F.col("anlage").alias("commodity"),
            F.col("erzeugung_mwh").alias("mwh"),
        )

    return Pipeline(
        schema="smard",
        table="generation",
        read=read,
        transform=transform,
        ts_col="ts",
        dedup_keys=["ts", "commodity"],
        dedup_order=["mwh"],
        data_source="https://smard.example",
        license="CC-BY",
    )


def test_full_crawl_lifecycle(spark, tmp_path):
    lake = str(tmp_path / "lake")

    # crawl 1
    p1 = _make_pipeline(spark, tmp_path, CSV_BATCH1, "b1")
    r1 = run_all(spark, lake, [p1])
    # rows = batch rows past the watermark (4); the PK dedup then
    # drops the duplicate at write time (3 stored)
    assert r1[0].error is None and r1[0].rows == 4

    out1 = read_table_or_none(spark, lake, "smard", "generation")
    assert out1.count() == 3
    got = {(str(r.ts), r.commodity): r.mwh for r in out1.collect()}
    assert got[("2024-03-01 00:15:00", "wind")] == 1300.0  # keep-first by order col

    # crawl 2: watermark resume — only rows newer than 00:15 enter
    p2 = _make_pipeline(spark, tmp_path, CSV_BATCH2, "b2")
    r2 = run_all(spark, lake, [p2])
    assert r2[0].rows == 2
    out2 = read_table_or_none(spark, lake, "smard", "generation")
    assert out2.count() == 5
    assert (
        out2.filter((F.col("commodity") == "wind") & (F.col("mwh") == 7777.7)).count() == 0
    )

    # catalog reflects the dataset
    cat = read_metadata(spark, lake).filter(F.col("schema_name") == "smard").collect()[0]
    assert cat.tables == 1 and str(cat.temporal_end) == "2024-03-01 00:30:00"
    assert cat.data_source == "https://smard.example"

    # failure isolation: a broken pipeline doesn't block others
    boom = Pipeline(
        schema="broken",
        table="t",
        read=lambda s: (_ for _ in ()).throw(OSError("fetch died")),
    )
    results = run_all(spark, lake, [boom, _make_pipeline(spark, tmp_path, CSV_BATCH1, "b3")])
    assert results[0].error is not None and "fetch died" in results[0].error
    assert results[1].error is None


def test_crawl_all_multi_schema_sweep(spark, tmp_path):
    """The crawl_all.py __main__ analog: discover registered crawlers,
    derive schema names, run each through the shared contract — one
    metadata row per schema, watermark-resume idempotent re-run, one
    summary relation, crawler-level isolation."""
    from open_energy_data_server_spark.pipeline import (
        available_crawlers,
        crawl_all,
        register_crawler,
        schema_name_of,
        summary_table,
    )

    lake = str(tmp_path / "lake")

    def wind_build(schema):
        p = _make_pipeline(spark, tmp_path, CSV_BATCH1, f"{schema}_w")
        p.schema = schema
        return [p]

    def solar_build(schema):
        p = _make_pipeline(spark, tmp_path, CSV_BATCH2, f"{schema}_s")
        p.schema = schema
        return [p]

    def broken_build(schema):
        raise OSError("source catalog unreachable")

    register_crawler("windpark_crawler", wind_build)
    register_crawler("solarfield_crawler", solar_build)
    register_crawler("deadsource_crawler", broken_build)
    register_crawler("private_crawler", wind_build)  # excluded below

    assert schema_name_of("windpark_crawler") == "windpark"
    names = available_crawlers(exclude=("private_crawler",))
    assert names == [
        "deadsource_crawler", "solarfield_crawler", "windpark_crawler",
    ]

    results = crawl_all(spark, lake, exclude=("private_crawler",))
    by_schema = {r.schema: r for r in results}
    # broken crawler isolated, the others landed
    assert "unreachable" in by_schema["deadsource"].error
    assert by_schema["windpark"].error is None
    assert by_schema["solarfield"].error is None

    # one metadata row per successful schema
    cat = read_metadata(spark, lake)
    schemas = sorted(r.schema_name for r in cat.collect())
    assert schemas == ["solarfield", "windpark"]

    # summary relation mirrors the result list
    summ = summary_table(spark, results).collect()
    assert {(r.schema_name, r.error is None) for r in summ} == {
        ("deadsource", False), ("windpark", True), ("solarfield", True),
    }

    # idempotent re-run: watermark resume appends nothing, catalog
    # still holds exactly one row per schema
    results2 = crawl_all(
        spark, lake, names=["windpark_crawler", "solarfield_crawler"]
    )
    assert all(r.error is None and r.rows == 0 for r in results2)
    cat2 = read_metadata(spark, lake)
    assert sorted(r.schema_name for r in cat2.collect()) == [
        "solarfield", "windpark",
    ]
    wind = read_table_or_none(spark, lake, "windpark", "generation")
    assert wind.count() == 3  # unchanged by the re-run
