"""Morton (Z-order) clustering (SURVEY §4 — 'Z-order if Delta').

The reference's composite B-tree indexes serve (key, time) lookups
(/root/reference/crawler/entsoe_crawler.py:303-309); single-column
``sortWithinPartitions`` only skips row groups for the leading key.
Z-ordering interleaves the bits of two normalized key columns so
parquet row-group min/max stats stay selective for BOTH dimensions —
the same effect Delta's OPTIMIZE ZORDER provides, as a plain column
expression (codegen, no Delta required).

Usage at write time::

    write_table(zorder_sorted(df, "country_code", "epoch_day"), ...)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale a numeric column onto [0, 2^bits) as a bigint."""
    span = hi - lo
    frac = F.when(span > 0, (col - lo) / span).otherwise(F.lit(0.0))
    max_val = (1 << bits) - 1
    return F.least(
        F.lit(max_val).cast("bigint"),
        F.floor(frac * (1 << bits)).cast("bigint"),
    )


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Bit-interleave two ``bits``-wide bigints → one Z-value.

    Built as a sum of shifted bit extractions — 2·bits plain integer
    expressions, fully codegen'd (no UDF).
    """
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z + (bit_a.cast("bigint") * F.lit(1 << (2 * i)).cast("bigint"))
        z = z + (bit_b.cast("bigint") * F.lit(1 << (2 * i + 1)).cast("bigint"))
    return z


def zorder_sorted(df: DataFrame, col_a: str, col_b: str, bits: int = 16) -> DataFrame:
    """Sort rows within partitions by the Morton code of (col_a,
    col_b). Column ranges are taken from a one-pass min/max aggregate
    (broadcast scalar row — O(metadata) on parquet sources)."""
    bounds = df.agg(
        F.min(col_a).cast("double").alias("__alo"),
        F.max(col_a).cast("double").alias("__ahi"),
        F.min(col_b).cast("double").alias("__blo"),
        F.max(col_b).cast("double").alias("__bhi"),
    )
    with_z = (
        df.join(F.broadcast(bounds))
        .withColumn(
            "__z",
            morton_interleave(
                _normalize(F.col(col_a).cast("double"), F.col("__alo"), F.col("__ahi"), bits),
                _normalize(F.col(col_b).cast("double"), F.col("__blo"), F.col("__bhi"), bits),
                bits,
            ),
        )
        .drop("__alo", "__ahi", "__blo", "__bhi")
    )
    return with_z.sortWithinPartitions("__z").drop("__z")
