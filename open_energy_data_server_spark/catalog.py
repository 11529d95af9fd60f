"""Metadata catalog (SURVEY K10, A9, A10, F11).

Exact column set of the reference's ``public.metadata``
(/root/reference/init.sql:10-23), maintained by the ingestion
framework the way ``BaseCrawler.set_metadata`` upserts it
(/root/reference/crawler/common/base_crawler.py:25-64):
one row per dataset schema, refreshed after every crawl with computed
stats (table count, byte size, temporal extent).

Upsert = read + union + keep-last(schema_name) + overwrite — the
parquet-only MERGE. The catalog is tiny (one row per dataset), so the
read-modify-write is trivially cheap at any lake size; with Delta
available it becomes ``MERGE INTO`` unchanged.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_energy_data_server_spark.operators.dedup import keep_last
from open_energy_data_server_spark.sinks.writer import read_table_or_none

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("schema_name", T.StringType(), False),
        T.StructField("crawl_date", T.DateType(), True),
        T.StructField("data_date", T.DateType(), True),
        T.StructField("data_source", T.StringType(), True),
        T.StructField("license", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("contact", T.StringType(), True),
        T.StructField("tables", T.IntegerType(), True),
        T.StructField("size", T.LongType(), True),
        T.StructField("temporal_start", T.TimestampType(), True),
        T.StructField("temporal_end", T.TimestampType(), True),
        T.StructField("concave_hull_geometry", T.StringType(), True),
    ]
)

CATALOG_TABLE = "_catalog/metadata"


def _catalog_path(lake_root: str) -> str:
    return os.path.join(lake_root, CATALOG_TABLE)


def read_metadata(spark: SparkSession, lake_root: str) -> DataFrame:
    path = _catalog_path(lake_root)
    if os.path.isdir(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], METADATA_SCHEMA)


def schema_stats(lake_root: str, schema: str) -> tuple[int, int]:
    """(table_count, total_bytes) from the lake file listing — the
    analog of the reference's pg_total_relation_size sweep
    (base_crawler.py:50-59)."""
    root = os.path.join(lake_root, schema)
    if not os.path.isdir(root):
        return 0, 0
    n_tables, total = 0, 0
    for entry in sorted(os.scandir(root), key=lambda e: e.name):
        if entry.is_dir():
            n_tables += 1
            for dirpath, _dirs, files in os.walk(entry.path):
                total += sum(os.path.getsize(os.path.join(dirpath, f)) for f in files)
    return n_tables, total


def temporal_extent(
    spark: SparkSession, lake_root: str, schema: str, tables_and_ts: dict[str, str]
) -> tuple[dt.datetime | None, dt.datetime | None]:
    """A10: min/max over the named timestamp column of each table —
    the metadata_sql_helpers.sql dynamic sweep as a driver loop; each
    probe scans one column (parquet footer stats make it cheap)."""
    lo, hi = None, None
    for table, ts_col in tables_and_ts.items():
        df = read_table_or_none(spark, lake_root, schema, table)
        if df is None or ts_col not in df.columns:
            continue
        row = df.agg(F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")).collect()[0]
        if row.lo is not None:
            lo = row.lo if lo is None else min(lo, row.lo)
        if row.hi is not None:
            hi = row.hi if hi is None else max(hi, row.hi)
    return lo, hi


def upsert_metadata(
    spark: SparkSession,
    lake_root: str,
    schema_name: str,
    data_source: str = "",
    license: str = "",
    description: str = "",
    contact: str = "",
    data_date: dt.date | None = None,
    tables_and_ts: dict[str, str] | None = None,
    concave_hull_geometry: str | None = None,
    crawl_date: dt.date | None = None,
) -> DataFrame:
    """K10 MERGE-on-schema_name with computed stats; returns the new
    catalog DataFrame (also persisted)."""
    n_tables, size = schema_stats(lake_root, schema_name)
    lo, hi = (
        temporal_extent(spark, lake_root, schema_name, tables_and_ts)
        if tables_and_ts
        else (None, None)
    )
    new_row = Row(
        schema_name=schema_name,
        crawl_date=crawl_date or dt.date.today(),
        data_date=data_date,
        data_source=data_source,
        license=license,
        description=description,
        contact=contact,
        tables=n_tables,
        size=size,
        temporal_start=lo,
        temporal_end=hi,
        concave_hull_geometry=concave_hull_geometry,
    )
    updates = spark.createDataFrame([new_row], METADATA_SCHEMA)
    current = read_metadata(spark, lake_root)
    merged = keep_last(
        current.withColumn("_v", F.lit(0)).unionByName(updates.withColumn("_v", F.lit(1))),
        keys=["schema_name"],
        order_by=["_v"],
    ).drop("_v")

    path = _catalog_path(lake_root)
    tmp = path + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return read_metadata(spark, lake_root)
