"""Testdata table loading helpers.

The driver provides deterministic TPC-H-ish parquet tables
(TESTDATA.md). Queries in ``__spark_entry__`` load through here so
every scan goes through one place (schema pruning + partition-friendly
reads happen automatically via the parquet source).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# DataFrame *handles* (logical plans, not data) cached per
# (session, sf_dir, table): rebuilding one costs a parquet footer read
# for schema inference plus py4j round-trips — ~100 ms that multiplies
# by every query × table in a 65-query bench sweep. Keyed by
# applicationId so a stopped/recreated session never serves stale
# plans.
_HANDLES: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _HANDLES.get(key)
    if cached is not None:
        return cached
    # The driver's events table has stored its ts column two ways across
    # testdata generations: TIMESTAMP(NANOS) (a parquet type Spark has no
    # native reader for — read nanos as raw INT64 per SPARK-40819 and
    # truncate to micros) and tz-naive TIMESTAMP(MICROS) (which Spark 4
    # infers as TIMESTAMP_NTZ; functions like unix_micros reject NTZ).
    # Normalize both to plain TimestampType here — under the UTC session
    # timezone the NTZ cast is a metadata reinterpretation, not a shift —
    # so every downstream operator sees one timestamp type.
    if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for field in df.schema.fields:
        # the nanos-as-long reinterpretation applies ONLY to the events
        # table known to store TIMESTAMP(NANOS) — a generic bigint 'ts'
        # elsewhere (epoch seconds/millis) must not be silently rescaled
        if name == "events" and field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    _HANDLES[key] = df
    return df


def local_df(spark: SparkSession, rows: list[tuple], schema: str) -> DataFrame:
    """Small literal table → DataFrame through the Arrow/LocalRelation
    path. ``spark.createDataFrame(list, ...)`` plans a Python
    ``ExistingRDD`` scan that re-pickles through a Python worker on
    EVERY execution (~0.3 s per run even for 3 rows); routing the same
    rows through a pandas DataFrame yields a plan-embedded
    LocalRelation (~0.02 s, no Python in the executed plan)."""
    import pandas as pd

    names = [f.split()[0] for f in schema.split(",")]
    pdf = pd.DataFrame(rows, columns=[n.strip() for n in names])
    return spark.createDataFrame(pdf, schema=schema)


def optimize_layout(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    bytes_per_split: int = 262_144,
    max_splits: int = 32,
) -> str:
    """Ingest/compaction pass: rewrite each table into a multi-file
    parquet layout sized so scans parallelize.

    Spark's unit of scan parallelism is the parquet row group / file
    split; the driver's testdata is written as ONE row group per table,
    so every scan is a single task no matter how many cores exist. A
    production 100 TB table has thousands of row groups and scans are
    embarrassingly parallel — this pass (the compaction step any
    lakehouse runs at ingest, cf. ``operators/zorder.py`` for the
    clustering variant) restores that layout. It also rewrites the
    events table's TIMESTAMP(NANOS) column as standard micros, so time
    predicates regain parquet pushdown (the nanos-as-long workaround in
    ``load_table`` defeats it on the raw files).

    Returns ``dst_dir``. Row *content* is identical; only file layout
    (and therefore row order, which no query relies on) changes.
    """
    import json
    from concurrent.futures import ThreadPoolExecutor

    # idempotence: a manifest records source mtimes + layout params;
    # on exact match the existing rewrite is current — skip the work
    # (repeated bench runs in one session pay ingest once)
    manifest = {
        "params": [bytes_per_split, max_splits],
        "sources": {
            name: os.path.getmtime(f"{src_dir}/{name}.parquet")
            for name in TABLES
            if os.path.exists(f"{src_dir}/{name}.parquet")
        },
    }
    marker = f"{dst_dir}/_layout_manifest.json"
    try:
        with open(marker) as fh:
            if json.load(fh) == manifest:
                return dst_dir
    except (OSError, ValueError):
        pass

    def rewrite(name: str) -> None:
        src = f"{src_dir}/{name}.parquet"
        df = load_table(spark, src_dir, name)
        # split count from the compressed source size — no count() job
        n_bytes = os.path.getsize(src) if os.path.isfile(src) else 0
        splits = min(max_splits, max(1, n_bytes // bytes_per_split))
        df.repartition(int(splits)).write.mode("overwrite").parquet(
            f"{dst_dir}/{name}.parquet"
        )

    # the rewrites are independent, latency-bound jobs — submit them
    # concurrently and let the Spark scheduler interleave the stages
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(pool.map(rewrite, TABLES))
    os.makedirs(dst_dir, exist_ok=True)
    with open(marker, "w") as fh:
        json.dump(manifest, fh)
    return dst_dir


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for SQL-form queries)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
