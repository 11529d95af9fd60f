"""End-to-end tests of the ingestion framework: locale CSV (the F10
torture dialect), record-mux, JSON flattening, landing+zip, lake
writer (partitioning / evolution / PK dedup), watermark resume, and
the metadata catalog."""

from __future__ import annotations

import datetime as dt
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from open_energy_data_server_spark.catalog import read_metadata, upsert_metadata
from open_energy_data_server_spark.operators.incremental import (
    WatermarkStore,
    align_to_period,
    backfill_windows,
    incremental_append,
    probe_watermark,
)
from open_energy_data_server_spark.sources.csv_locale import CsvDialect, read_locale_csv
from open_energy_data_server_spark.sources.json_flat import explode_series, flatten_structs
from open_energy_data_server_spark.sources.landing import land
from open_energy_data_server_spark.sources.record_mux import read_record_mux
from open_energy_data_server_spark.sinks.writer import (
    append_evolve,
    read_table_or_none,
    write_table,
)

DIRTY_CSV = """junk preamble line 1
junk preamble line 2
Datum;Anlage (MW);Preis €/MWh;Status
2024-03-01;1.234,5;  42,7 ;ok
2024-03-02;N.A.;-;fail
2024-03-03; 7;0,25;ok

"""


def test_locale_csv_dirty(spark, tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(DIRTY_CSV)
    dialect = CsvDialect(
        skiprows=2, numeric_columns=["Anlage (MW)", "Preis €/MWh"], sanitize=True
    )
    df = read_locale_csv(spark, str(p), dialect)
    assert df.columns == ["datum", "anlage_mw", "preis_mwh", "status"]
    rows = {r.datum: (r.anlage_mw, r.preis_mwh) for r in df.collect()}
    assert rows["2024-03-01"] == (1234.5, 42.7)
    assert rows["2024-03-02"] == (None, None)
    assert rows["2024-03-03"] == (7.0, 0.25)


def test_locale_csv_no_skiprows(spark, tmp_path):
    p = tmp_path / "plain.csv"
    p.write_text("a;b\n1;2,5\n")
    df = read_locale_csv(spark, str(p), CsvDialect(numeric_columns=["b"]))
    assert df.collect()[0].b == 2.5


def test_record_mux(spark, tmp_path):
    p = tmp_path / "eex.txt"
    p.write_text(
        "# comment header\n"
        "ST;base;100.5\n"
        "PR;2024-01-01;42.0;7\n"
        "ST;peak;200.25\n"
        "garbage line\n"
    )
    out = read_record_mux(
        spark,
        str(p),
        {"ST": "name STRING, v DOUBLE", "PR": "d STRING, price DOUBLE, n INT"},
    )
    st = {r.name: r.v for r in out["ST"].collect()}
    assert st == {"base": 100.5, "peak": 200.25}
    pr = out["PR"].collect()
    assert len(pr) == 1 and pr[0].price == 42.0 and pr[0].record_type == "PR"


def test_json_flatten_and_series(spark, tmp_path):
    p = tmp_path / "api.jsonl"
    p.write_text(
        '{"meta": {"station": {"id": 7, "city": "aachen"}}, "series": [[1704067200000, 1.5], [1704070800000, 2.5]]}\n'
    )
    df = spark.read.json(str(p))
    flat = flatten_structs(df)
    assert "meta_station_id" in flat.columns and "meta_station_city" in flat.columns
    long = explode_series(flat, "series", ["ts_ms", "mwh"])
    rows = sorted((r.ts_ms, r.mwh) for r in long.collect())
    assert rows == [(1704067200000, 1.5), (1704070800000, 2.5)]


def test_landing_zip_roundtrip(spark, tmp_path):
    src = tmp_path / "payload.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("a.csv", "x;y\n1;2\n")
        zf.writestr("b.csv", "x;y\n3;4\n")
    landed = land(str(src), str(tmp_path / "landing"), "payload.zip")
    assert os.path.isdir(landed)
    df = spark.read.option("sep", ";").option("header", "true").csv(landed)
    assert df.count() == 2


def test_landing_retry_then_fail(tmp_path):
    calls = []

    def flaky(url):
        calls.append(url)
        raise OSError("boom")

    with pytest.raises(RuntimeError, match="fetch failed"):
        land("u", str(tmp_path / "l"), "f", fetcher=flaky, retries=3, backoff_s=0)
    assert len(calls) == 3


def test_write_partitioned_and_pruned(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 5), 10.0), (2, dt.datetime(2024, 1, 2, 6), 20.0)],
        "id long, ts timestamp, v double",
    )
    write_table(df, lake, "smard", "gen", mode="overwrite", time_col="ts", sort_keys=["id"])
    assert os.path.isdir(os.path.join(lake, "smard", "gen", "p_date=2024-01-01"))
    back = read_table_or_none(spark, lake, "smard", "gen")
    pruned = back.filter(F.col("p_date") == "2024-01-02")
    assert pruned.count() == 1
    # partition filter must reach the scan
    assert "p_date" in pruned._jdf.queryExecution().executedPlan().toString()


def test_schema_evolution_append(spark, tmp_path):
    lake = str(tmp_path / "lake")
    v1 = spark.createDataFrame([(1, 1.0)], "id long, a double")
    v2 = spark.createDataFrame([(2, 2.0, "new")], "id long, a double, b string")
    append_evolve(v1, lake, "s", "t")
    append_evolve(v2, lake, "s", "t")
    back = read_table_or_none(spark, lake, "s", "t").toPandas().sort_values("id")
    assert list(back.columns) == ["id", "a", "b"]
    assert back.iloc[0].b is None and back.iloc[1].b == "new"


def test_pk_dedup_on_write(spark, tmp_path):
    lake = str(tmp_path / "lake")
    b1 = spark.createDataFrame([(1, "x", 1), (1, "dup", 2), (2, "y", 1)], "k long, v string, seq int")
    write_table(b1, lake, "s", "t", mode="append", dedup_keys=["k"], dedup_order=["seq"])
    # second batch: existing key 1 dropped, new key 3 kept
    b2 = spark.createDataFrame([(1, "again", 9), (3, "z", 1)], "k long, v string, seq int")
    write_table(b2, lake, "s", "t", mode="append", dedup_keys=["k"], dedup_order=["seq"])
    back = {r.k: r.v for r in read_table_or_none(spark, lake, "s", "t").collect()}
    assert back == {1: "x", 2: "y", 3: "z"}


def test_incremental_watermark_resume(spark, tmp_path):
    lake = str(tmp_path / "lake")
    t0 = dt.datetime(2024, 1, 1)
    mk = lambda hrs: spark.createDataFrame(  # noqa: E731
        [(h, t0 + dt.timedelta(hours=h)) for h in hrs], "id long, ts timestamp"
    )
    _, n1 = incremental_append(mk(range(5)), lake, "s", "t", "ts")
    assert n1 == 5
    # overlapping batch: only hours 5..7 are new
    _, n2 = incremental_append(mk(range(3, 8)), lake, "s", "t", "ts")
    assert n2 == 3
    assert probe_watermark(spark, lake, "s", "t", "ts") == t0 + dt.timedelta(hours=7)
    # quality delay: nothing newer than now-2h gets in (T3)
    _, n3 = incremental_append(
        mk(range(8, 12)),
        lake,
        "s",
        "t",
        "ts",
        quality_delay=dt.timedelta(hours=2),
        now=t0 + dt.timedelta(hours=11),
    )
    assert n3 == 1  # only hour 8 < now-2h


def test_watermark_store_and_alignment(tmp_path):
    store = WatermarkStore(str(tmp_path / "wm.json"))
    assert store.get("k") is None
    store.set("k", dt.datetime(2024, 3, 1, 12, 30))
    assert store.get("k") == dt.datetime(2024, 3, 1, 12, 30)
    # T4: floor onto weekly grid anchored Sunday 22:00 (smard)
    aligned = align_to_period(
        dt.datetime(2024, 3, 6, 9, 15),
        dt.timedelta(days=7),
        origin=dt.datetime(2024, 2, 25, 22, 0),
    )
    assert aligned == dt.datetime(2024, 3, 3, 22, 0)
    wins = backfill_windows(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 20), dt.timedelta(days=8))
    assert [w[0].day for w in wins] == [1, 9, 17] and wins[-1][1].day == 20


def test_catalog_upsert(spark, tmp_path):
    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 2, 1))], "id long, ts timestamp"
    )
    write_table(df, lake, "smard", "gen", mode="overwrite")
    cat = upsert_metadata(
        spark,
        lake,
        "smard",
        data_source="https://example.org",
        license="CC-BY",
        tables_and_ts={"gen": "ts"},
    )
    row = cat.filter(F.col("schema_name") == "smard").collect()[0]
    assert row.tables == 1 and row.size > 0
    assert row.temporal_start == dt.datetime(2024, 1, 1)
    assert row.temporal_end == dt.datetime(2024, 2, 1)
    # second upsert replaces, not duplicates
    cat2 = upsert_metadata(spark, lake, "smard", data_source="v2")
    assert cat2.filter(F.col("schema_name") == "smard").count() == 1
    assert cat2.collect()[0].data_source == "v2"
    assert read_metadata(spark, lake).count() == 1


def test_optimize_layout(spark, tmp_path):
    """Compaction rewrite: identical rows, multi-split scan, events ts
    normalized to native TIMESTAMP (pushdown restored)."""
    from pyspark.sql import types as T

    from open_energy_data_server_spark.io import load_table, optimize_layout

    src = "/root/testdata/sf0.01"
    dst = optimize_layout(spark, src, str(tmp_path / "layout"))

    li_src = load_table(spark, src, "lineitem")
    li_dst = load_table(spark, dst, "lineitem")
    assert li_dst.rdd.getNumPartitions() > 1
    assert li_dst.count() == li_src.count()
    assert li_dst.schema == li_src.schema
    a = li_src.groupBy("l_returnflag").agg(F.sum("l_orderkey").alias("s"))
    b = li_dst.groupBy("l_returnflag").agg(F.sum("l_orderkey").alias("s"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    ev = load_table(spark, dst, "events")
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    # the rewritten file stores native micros — no nanos-as-long cast
    raw = spark.read.parquet(f"{dst}/events.parquet")
    assert isinstance(raw.schema["ts"].dataType, T.TimestampType)
    assert ev.count() == load_table(spark, src, "events").count()


def test_optimize_layout_idempotent(spark, tmp_path):
    """Second call with unchanged sources is a no-op (manifest match);
    changed params force a rewrite."""
    import os

    from open_energy_data_server_spark.io import optimize_layout

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "layout")
    optimize_layout(spark, src, dst)
    marker = f"{dst}/_layout_manifest.json"
    m1 = os.path.getmtime(marker)
    optimize_layout(spark, src, dst)
    assert os.path.getmtime(marker) == m1  # skipped
    optimize_layout(spark, src, dst, bytes_per_split=131_072)
    assert os.path.getmtime(marker) > m1  # params changed → rewrote


def test_compact_table_preserves_data(spark, tmp_path):
    """Compaction: fragmented partitions collapse to right-sized files
    with byte-identical content; healthy partitions are untouched."""
    from open_energy_data_server_spark.sinks.writer import (
        compact_table,
        table_path,
        write_table,
    )

    lake = str(tmp_path / "lake")
    df = spark.range(0, 2000).select(
        F.col("id"),
        F.to_timestamp(
            F.lit("2024-03-01 00:00:00").cast("timestamp")
            + F.make_interval(hours=(F.col("id") % 48).cast("int"))
        ).alias("ts"),
        (F.col("id") * 2).alias("v"),
    )
    # tiny maxRecordsPerFile fragments each of the 2 date partitions
    write_table(df, lake, "s", "t", time_col="ts", max_records_per_file=100)
    tpath = table_path(lake, "s", "t")
    import os as _os

    def files_in(p):
        return [
            f for f in _os.listdir(_os.path.join(tpath, p))
            if f.endswith(".parquet")
        ]

    parts = sorted(d for d in _os.listdir(tpath) if d.startswith("p_date="))
    assert len(parts) == 2 and all(len(files_in(p)) >= 10 for p in parts)

    before = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(tpath).collect()
    )
    done = compact_table(
        spark, lake, "s", "t", target_records_per_file=10_000
    )
    assert sorted(p for p, _, _ in done) == parts
    for p, n_before, n_after in done:
        assert n_after == 1 and n_before >= 10
        assert len(files_in(p)) == 1
    after = sorted(
        (r["id"], r["v"]) for r in spark.read.parquet(tpath).collect()
    )
    assert after == before

    # second run: nothing left to compact
    assert compact_table(spark, lake, "s", "t") == []


def test_compact_table_crash_recovery(spark, tmp_path):
    """A stranded .compact_old.* partition (crash between the two
    renames) is restored to its canonical name on the next run; stale
    .compact_tmp.* leftovers are removed; neither is ever treated as a
    partition."""
    import os as _os
    import shutil as _shutil

    from open_energy_data_server_spark.sinks.writer import (
        compact_table,
        table_path,
        write_table,
    )

    lake = str(tmp_path / "lake")
    df = spark.range(0, 500).select(
        F.col("id"),
        F.lit("2024-03-01 00:00:00").cast("timestamp").alias("ts"),
        (F.col("id") * 3).alias("v"),
    )
    write_table(df, lake, "s", "t", time_col="ts", max_records_per_file=50)
    tpath = table_path(lake, "s", "t")
    part = next(d for d in _os.listdir(tpath) if d.startswith("p_date="))
    # simulate a crash mid-swap: partition renamed away, tmp left over
    _os.rename(_os.path.join(tpath, part), _os.path.join(tpath, f".compact_old.{part}"))
    _os.makedirs(_os.path.join(tpath, f".compact_tmp.{part}"))
    # only hidden / marker entries remain at the table root (all "." or
    # "_" prefixed -> invisible to Spark's file index)
    assert all(d.startswith((".", "_")) for d in _os.listdir(tpath))

    done = compact_table(spark, lake, "s", "t", target_records_per_file=10_000)
    assert [p for p, _, _ in done] == [part]
    assert spark.read.parquet(tpath).count() == 500
    assert not any(d.startswith(".compact_") for d in _os.listdir(tpath))


def test_compact_table_unpartitioned_crash_recovery(spark, tmp_path):
    """Crash mid-swap on an UNPARTITIONED table leaves only
    .compact_old.<table> beside the table dir — a re-run must restore
    it instead of raising FileNotFoundError."""
    import os as _os

    from open_energy_data_server_spark.sinks.writer import (
        compact_table,
        table_path,
        write_table,
    )

    lake = str(tmp_path / "lake")
    df = spark.range(0, 400).select(F.col("id"), (F.col("id") * 7).alias("v"))
    write_table(df, lake, "s", "u", max_records_per_file=40)
    tpath = table_path(lake, "s", "u")
    parent = _os.path.dirname(tpath)
    _os.rename(tpath, _os.path.join(parent, ".compact_old.u"))
    assert not _os.path.isdir(tpath)

    done = compact_table(spark, lake, "s", "u", target_records_per_file=10_000)
    assert _os.path.isdir(tpath)
    assert spark.read.parquet(tpath).count() == 400
    assert done and done[0][0] == "."


def test_compact_repair_leaves_sibling_tables_alone(spark, tmp_path):
    """Parent-level crash repair is scoped to THIS table's suffix: a
    sibling table's in-flight .compact_tmp.* / stranded .compact_old.*
    in the same schema directory must survive a compact_table run on a
    different table (ADVICE r5 — concurrent per-table compactors)."""
    import os as _os

    from open_energy_data_server_spark.sinks.writer import (
        compact_table,
        table_path,
        write_table,
    )

    lake = str(tmp_path / "lake")
    df = spark.range(0, 200).select(
        F.col("id"),
        F.lit("2024-03-01 00:00:00").cast("timestamp").alias("ts"),
    )
    write_table(df, lake, "s", "t", time_col="ts", max_records_per_file=20)
    tpath = table_path(lake, "s", "t")
    schema_dir = _os.path.dirname(tpath.rstrip("/"))
    # simulate a concurrent compactor mid-write on sibling table "u"
    sib_tmp = _os.path.join(schema_dir, ".compact_tmp.u")
    sib_old = _os.path.join(schema_dir, ".compact_old.u")
    _os.makedirs(sib_tmp)
    _os.makedirs(sib_old)
    open(_os.path.join(sib_tmp, "part-0.parquet"), "w").close()

    compact_table(spark, lake, "s", "t", target_records_per_file=1000)

    assert _os.path.isdir(sib_tmp), "sibling tmp dir was deleted"
    # sibling old dir must not be force-restored/deleted by table t's run
    assert _os.path.isdir(sib_old) or _os.path.isdir(
        _os.path.join(schema_dir, "u")
    )


def test_land_bz2_gz_single_file_decompress(spark, tmp_path):
    """The DWD monthly shape: a .grb.bz2 lands decompressed so the
    binary GRIB codec path (which Spark does NOT gunzip/bunzip2 for
    binaryFile) reads raw message bytes; .gz likewise."""
    import bz2 as _bz2
    import gzip as _gzip

    from open_energy_data_server_spark.sources.landing import land
    from tests.test_grib1codec import make_grib1

    raw = make_grib1([0, 10, 20, 35], ni=2, nj=2)
    src_bz = tmp_path / "weather199501.grb.bz2"
    src_bz.write_bytes(_bz2.compress(raw))
    out = land(str(src_bz), str(tmp_path / "landing"), "weather199501.grb.bz2")
    assert out.endswith("weather199501.grb")
    from open_energy_data_server_spark.sources.grib2codec import decode_grib2

    assert len(decode_grib2(open(out, "rb").read())) == 4

    src_gz = tmp_path / "data.csv.gz"
    src_gz.write_bytes(_gzip.compress(b"a;b\n1;2\n"))
    out2 = land(str(src_gz), str(tmp_path / "landing"), "data.csv.gz")
    assert out2.endswith("data.csv")
    assert open(out2, "rb").read() == b"a;b\n1;2\n"

    # unpack=False keeps the raw archive
    out3 = land(
        str(src_bz), str(tmp_path / "landing"), "raw.bz2", unpack=False
    )
    assert open(out3, "rb").read()[:3] == b"BZh"
