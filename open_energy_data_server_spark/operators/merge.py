"""MERGE / upsert emulation on plain parquet (K10 generalized).

Delta's ``MERGE INTO`` is the natural form of the reference's
``INSERT ... ON CONFLICT DO UPDATE`` catalog upsert
(/root/reference/crawler/common/base_crawler.py:25-64); without Delta
jars in this container, the same semantics are composed from
anti-join + union (+ keep-last for in-batch duplicates):

    merged = updates ∪ (target ⟵anti⟶ updates on keys)

Partition-aware: when the table is date-partitioned and updates touch
few partitions, ``merge_upsert`` rewrites ONLY the touched partitions
(dynamic partition overwrite) — at 100 TB the rewrite cost is
O(changed partitions), not O(table). With Delta available, swap the
body for ``MERGE INTO``; the call signature is final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.dedup import keep_last
from open_energy_data_server_spark.sinks.writer import read_table_or_none, table_path


def merge_dataframes(
    target: DataFrame | None, updates: DataFrame, keys: list[str], version_col: str | None = None
) -> DataFrame:
    """Pure-plan MERGE: update rows win on key collision; within the
    updates batch the greatest ``version_col`` wins (or arbitrary-but-
    pinned by keys order when absent)."""
    updates = keep_last(updates, keys, [version_col] if version_col else keys)
    if target is None:
        return updates
    survivors = target.join(updates.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(updates, allowMissingColumns=True)


def merge_upsert(
    spark: SparkSession,
    lake_root: str,
    schema: str,
    table: str,
    updates: DataFrame,
    keys: list[str],
    version_col: str | None = None,
    partition_col: str | None = None,
) -> int:
    """Upsert ``updates`` into a lake table; returns final row count.

    With ``partition_col``: only partitions present in the batch are
    rewritten (``partitionOverwriteMode=dynamic``); rows of untouched
    partitions are never read or written. Without it: full rewrite
    through a staging directory (safe for the small dimension/catalog
    tables this path is meant for).
    """
    target = read_table_or_none(spark, lake_root, schema, table)
    path = table_path(lake_root, schema, table)

    if partition_col and target is not None:
        parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
        scoped_target = target.filter(F.col(partition_col).isin(parts))
        merged = merge_dataframes(scoped_target, updates, keys, version_col)
        # per-write option (not session conf): a session-wide
        # partitionOverwriteMode=dynamic would silently turn later
        # partitioned mode='overwrite' full replaces into partial ones
        (
            merged.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    else:
        merged = merge_dataframes(target, updates, keys, version_col)
        if target is None:
            writer = merged.write.mode("overwrite")
            if partition_col:
                writer = writer.partitionBy(partition_col)
            writer.parquet(path)
        else:
            tmp = path + ".staging"
            merged.write.mode("overwrite").parquet(tmp)
            staged = spark.read.parquet(tmp)
            writer = staged.write.mode("overwrite")
            if partition_col:
                writer = writer.partitionBy(partition_col)
            writer.parquet(path)
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)

    return spark.read.option("mergeSchema", "true").parquet(path).count()
