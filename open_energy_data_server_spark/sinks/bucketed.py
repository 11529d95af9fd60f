"""Bucketed tables — the zero-shuffle fact⋈fact join path.

The reference's biggest repeated join is fact-to-fact on orderkey-like
keys; at 100 TB the sort-merge exchange dominates. Writing both facts
``bucketBy(n, key)`` co-locates matching keys at write time, so later
joins and aggregations on the key run with **no Exchange at all**
(verified by plan assertion in tests/test_bucketed.py).

Bucketed writes go through ``saveAsTable`` (bucket metadata lives in
the session catalog); the warehouse location is configurable so tests
run against a temp dir. Bucket count rule of thumb: total table size /
(128–256 MB) rounded to a power of two shared by every co-bucketed
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (test
    helper for asserting bucket co-location)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan
