"""Key-dedup operators (SURVEY A7 / K9) — the engine's PK-enforcement
primitive, used on the write path since Spark has no unique
constraints.

The reference's ``~index.duplicated(keep="first")``
(/root/reference/crawler/smard.py:168-171,
/root/reference/crawler/e2watch.py:196-201) depends on incidental
pandas row order; distributed semantics require an explicit ordering,
so ``order_by`` is mandatory here — "first" must mean something.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first(df: DataFrame, keys: list[str], order_by: list[Column | str]) -> DataFrame:
    """One row per key — the first under ``order_by``.

    row_number over (keys) → exactly one shuffle on the dedup key;
    partial aggregation does not apply to row_number, so for
    massively-duplicated data prefer ``keep_min`` below.
    """
    # string orderings normalize to ASC NULLS LAST — the SQL-standard
    # (and DuckDB/PostgreSQL) default, where Spark's ASC puts NULLS
    # FIRST and would keep a NULL-ordered row over a real one
    order = [
        F.col(c).asc_nulls_last() if isinstance(c, str) else c
        for c in order_by
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_last(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def keep_min(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Agg-based keep-first for a single ordering column: min_by all
    payload columns. Unlike row_number, this gets map-side partial
    aggregation — at 100 TB with heavy duplication the shuffle carries
    one row per key per input partition instead of every row."""
    payload = [c for c in df.columns if c not in keys]
    return df.groupBy(*keys).agg(
        *[F.min_by(c, order_col).alias(c) for c in payload]
    )


def drop_exact_duplicates(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """dropDuplicates — hash-agg distinct on the subset."""
    return df.dropDuplicates(subset) if subset else df.distinct()
