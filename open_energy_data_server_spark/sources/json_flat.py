"""JSON API payload flattening (SURVEY S8).

Models the nested REST payloads the reference flattens at ingest:
smard chart ``series`` arrays (/root/reference/crawler/smard.py:100-112),
e2watch ``series[0].data`` (/root/reference/crawler/e2watch.py:120-152),
entsog/GIE list endpoints (/root/reference/crawler/entsog.py:53-94,
/root/reference/crawler/gie_crawler.py:86-133).

Spark shape: ``spark.read.json`` with an explicit schema (never
inference in production — one malformed doc changes the schema),
then ``explode`` for arrays and recursive struct flattening. All
plan-level — flattening never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_", max_depth: int = 10) -> DataFrame:
    """Recursively flatten struct columns to ``parent_child`` scalars
    (the reference's per-level dict flattening, gie_crawler.py:106-133).
    Arrays are left intact — explode them explicitly first."""
    for _ in range(max_depth):
        struct_cols = [
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)
        ]
        if not struct_cols:
            break
        cols = []
        for f in df.schema.fields:
            if f.name in struct_cols:
                inner: T.StructType = f.dataType  # type: ignore[assignment]
                cols.extend(
                    F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}")
                    for sub in inner.fields
                )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
    return df


def explode_series(
    df: DataFrame,
    series_col: str,
    value_names: list[str],
    keep: list[str] | None = None,
) -> DataFrame:
    """smard-shaped ``series: [[ts_ms, value], ...]`` → long rows.

    ``value_names`` names the positional elements of each inner array
    (e.g. ``["ts_ms", "mwh"]``)."""
    keep = keep or [c for c in df.columns if c != series_col]
    exploded = df.select(*keep, F.explode(F.col(series_col)).alias("_elem"))
    return exploded.select(
        *keep,
        *[F.col("_elem").getItem(i).alias(name) for i, name in enumerate(value_names)],
    )
