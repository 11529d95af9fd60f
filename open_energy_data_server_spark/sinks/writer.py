"""Lake writer (SURVEY K1–K9).

Layout: ``lake/<schema>/<table>/`` partitioned parquet. Design
mapping from the reference:

- hypertable chunking (K7, ``create_hypertable`` post-load,
  /root/reference/crawler/entsoe_crawler.py:317-320) → ``partitionBy``
  a derived date column at write time; chunk exclusion ≡ partition
  pruning, and there is no post-hoc migration step at all.
- secondary (key, time) indexes (K8,
  /root/reference/crawler/entsoe_crawler.py:303-309) →
  ``sortWithinPartitions(keys)`` before write: parquet row-group
  min/max stats then skip like a coarse index.
- append / replace (K1/K2) → save modes.
- schema-evolution append (K3, the read-concat-replace fallback,
  /root/reference/crawler/entsoe_crawler.py:196-212) → parquet append
  of the new schema + ``mergeSchema`` on read; evolution is metadata-
  only, no rewrite of old files.
- PK dedup (K9, /root/reference/crawler/mastr.py:139-150) →
  ``dedup_keys`` applies keep-first against existing data
  (left-anti + in-batch keep_first) before the append.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.dedup import keep_first


def table_path(lake_root: str, schema: str, table: str) -> str:
    return os.path.join(lake_root, schema, table)


def write_table(
    df: DataFrame,
    lake_root: str,
    schema: str,
    table: str,
    mode: str = "append",
    time_col: str | None = None,
    sort_keys: list[str] | None = None,
    dedup_keys: list[str] | None = None,
    dedup_order: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> str:
    """Write a table into the lake; returns its path.

    ``time_col`` → adds a ``p_date`` partition column (hypertable
    analog). ``sort_keys`` → sortWithinPartitions for row-group
    skipping. ``dedup_keys`` → enforce PK: drop batch rows whose key
    already exists (left-anti vs existing) and keep-first within the
    batch (ordering pinned by ``dedup_order``).
    """
    path = table_path(lake_root, schema, table)
    spark = df.sparkSession

    if dedup_keys:
        df = keep_first(df, dedup_keys, dedup_order or dedup_keys)
        existing = read_table_or_none(spark, lake_root, schema, table)
        if existing is not None and mode == "append":
            df = df.join(
                existing.select(*dedup_keys).distinct(), dedup_keys, "left_anti"
            )

    partition_cols: list[str] = []
    if time_col is not None:
        df = df.withColumn("p_date", F.to_date(F.col(time_col)))
        partition_cols = ["p_date"]

    if sort_keys:
        df = df.sortWithinPartitions(*sort_keys)

    writer = df.write.mode(mode)
    if max_records_per_file:
        # K5: bounded output file sizes (the reference's 200k-row write
        # slices, vea_industrial_load_profiles.py:136-150) — built-in
        # option, no repartition needed
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)
    return path


def read_table_or_none(
    spark: SparkSession, lake_root: str, schema: str, table: str
) -> DataFrame | None:
    """Read a lake table with schema merge (evolution-tolerant), or
    None if it does not exist yet."""
    path = table_path(lake_root, schema, table)
    if not os.path.isdir(path):
        return None
    try:
        return spark.read.option("mergeSchema", "true").parquet(path)
    except Exception:
        return None


def append_evolve(
    df: DataFrame, lake_root: str, schema: str, table: str, **write_kwargs
) -> str:
    """K3: append a batch whose schema may have new columns.

    Parquet directories tolerate heterogeneous file schemas; readers
    get the union via mergeSchema (read_table_or_none). Old files are
    never rewritten — the reference re-reads and replaces the whole
    table on UndefinedColumn; here evolution is free.
    """
    return write_table(df, lake_root, schema, table, mode="append", **write_kwargs)


def compact_table(
    spark: SparkSession,
    lake_root: str,
    schema: str,
    table: str,
    target_records_per_file: int = 1_000_000,
    min_files_to_compact: int = 4,
) -> list[tuple[str, int, int]]:
    """Small-files maintenance: rewrite fragmented partitions of a
    lake table into right-sized files — the compaction job every
    incremental lake needs once append batches (crawl runs, streaming
    micro-batches) have scattered a partition across many tiny files.

    Per partition directory (``p_date=…``; the table root when
    unpartitioned): if it holds ≥ ``min_files_to_compact`` data files,
    rewrite it to ceil(rows / target) files (distributed repartition
    write to a DOT-PREFIXED temp dir — hidden from Spark's file index,
    so a concurrent read never sees it as a phantom partition — then a
    two-rename swap). Returns (partition, n_files_before,
    n_files_after) per rewritten partition.

    Crash safety: stale ``.compact_tmp.*`` leftovers are deleted and a
    stranded ``.compact_old.*`` (crash between the two renames) is
    restored to its canonical name at entry, so a re-run self-repairs.
    The swap itself is two renames, not one atomic op — a reader
    listing the table in that microsecond window misses the partition
    (never double-counts it); on an object store, run compaction
    through a table format's commit protocol instead.

    Scale shape: the driver loop is over PARTITIONS (bounded: recent
    dates in steady state — pass the table root of a date-partitioned
    lake and only fragmented partitions rewrite); each rewrite is a
    distributed scan+shuffle of ONE partition's data. Sort order
    within files is preserved per ``sortWithinPartitions`` at write
    time being re-applied downstream; compaction itself only re-bins.
    """
    import math
    import shutil

    path = table_path(lake_root, schema, table)

    # self-repair from a previous crashed run (scan the table root for
    # partition-level leftovers AND its parent for the unpartitioned
    # case, where tmp/old siblings live beside the table dir). The
    # parent scan is scoped to THIS table's exact suffix — a blanket
    # parent sweep would delete a concurrent sibling-table compaction's
    # in-flight temp dir mid-write (single-compactor applies PER TABLE,
    # not per schema). It runs FIRST and before the existence check: a
    # crash mid-swap on an unpartitioned table leaves ONLY
    # .compact_old.<t> behind — the restore below brings the table back.
    def _repair(scan_dir: str, only: str | None = None) -> None:
        if not os.path.isdir(scan_dir):
            return
        for d in os.listdir(scan_dir):
            full = os.path.join(scan_dir, d)
            if d.startswith(".compact_tmp.") and os.path.isdir(full):
                if only is not None and d != f".compact_tmp.{only}":
                    continue
                shutil.rmtree(full)
            elif d.startswith(".compact_old.") and os.path.isdir(full):
                if only is not None and d != f".compact_old.{only}":
                    continue
                canonical = os.path.join(scan_dir, d[len(".compact_old.") :])
                if os.path.isdir(canonical):
                    shutil.rmtree(full)  # swap completed; old copy stale
                else:
                    os.rename(full, canonical)  # crash mid-swap: restore

    _repair(
        os.path.dirname(path.rstrip("/")),
        only=os.path.basename(path.rstrip("/")),
    )
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    _repair(path)
    part_dirs = sorted(
        d for d in os.listdir(path)
        if os.path.isdir(os.path.join(path, d))
        and "=" in d
        and not d.startswith((".", "_"))
    )
    results: list[tuple[str, int, int]] = []
    for part in part_dirs or [""]:
        pdir = os.path.join(path, part) if part else path
        files = [
            f
            for f in os.listdir(pdir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if len(files) < min_files_to_compact:
            continue
        df = spark.read.parquet(pdir)
        n = df.count()
        n_out = max(1, math.ceil(n / target_records_per_file))
        if n_out >= len(files):
            continue
        base = part or os.path.basename(path.rstrip("/"))
        parent = path if part else os.path.dirname(path.rstrip("/"))
        tmp = os.path.join(parent, f".compact_tmp.{base}")
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
        old = os.path.join(parent, f".compact_old.{base}")
        os.rename(pdir, old)
        os.rename(tmp, pdir)
        shutil.rmtree(old)
        results.append((part or ".", len(files), n_out))
    return results
