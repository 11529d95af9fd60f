"""Hierarchical (tree) data operators (SURVEY §1.1).

The reference flattens the GIE country→company→location tree into
per-level tables with a ``parent`` pointer
(/root/reference/crawler/gie_crawler.py:106-133) and the dashboards
join levels back together through distinct-subqueries (gie.json).
These operators cover both directions for a fixed-depth hierarchy:

- ``resolve_path``: annotate the leaf level with its full ancestor
  chain (N−1 broadcast joins — levels are dimension-sized).
- ``rollup_to_parent``: aggregate child measures one level up (the
  storage dashboards' per-country totals from per-location data).

Fixed-depth joins, not recursion: energy hierarchies are 2–4 levels;
at 100 TB only the leaf level is big, and every join here keeps the
upper levels broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resolve_path(
    levels: list[DataFrame],
    key_col: str = "name",
    parent_col: str = "parent",
    level_names: list[str] | None = None,
) -> DataFrame:
    """levels[0] = root table … levels[-1] = leaf table. Returns the
    leaf rows plus one ``<level_name>`` column per ancestor level."""
    if len(levels) < 2:
        raise ValueError("need at least 2 levels")
    level_names = level_names or [f"level_{i}" for i in range(len(levels))]

    out = levels[-1]
    parent_ref = F.col(parent_col)
    for i in range(len(levels) - 2, -1, -1):
        anc = levels[i].select(
            F.col(key_col).alias(f"__k{i}"),
            F.col(parent_col).alias(f"__p{i}") if parent_col in levels[i].columns else F.lit(None).alias(f"__p{i}"),
        )
        out = out.join(F.broadcast(anc), parent_ref == F.col(f"__k{i}"), "left")
        out = out.withColumn(level_names[i], F.col(f"__k{i}"))
        parent_ref = F.col(f"__p{i}")
        out = out.drop(f"__k{i}")
    return out.drop(*[f"__p{i}" for i in range(len(levels) - 1)])


def rollup_to_parent(
    children: DataFrame,
    parent_col: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Aggregate child rows to their parent key (one hash-agg)."""
    return children.groupBy(F.col(parent_col).alias("name"), *group_cols).agg(*aggs)
