"""Reshape operators (SURVEY §2.7, R1–R6).

Models: wide→long melts (/root/reference/crawler/regelleistung.py:246-314,
/root/reference/crawler/vea_industrial_load_profiles.py:109-127),
suffix-classified column routing
(/root/reference/crawler/regelleistung.py:250-281), matrix unstack
(/root/reference/crawler/eview.py:64-70), union-with-evolution
(/root/reference/crawler/entsoe_crawler.py:196-212).

Scale notes: a melt is a flatMap — no shuffle at all; the chunked
variant exists because a single ``stack`` of 35k columns blows up the
analyzer, not because of data volume. Each chunk re-scans only its
columns (column pruning), so total IO ≈ one full scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
    value_type: str = "double",
    chunk_size: int = 500,
) -> DataFrame:
    """pandas ``melt`` — wide columns → (id_vars, variable, value) rows.

    Uses ``stack(n, 'name1', col1, ...)``; for very wide frames (VEA:
    35,136 time columns) the stack expression is generated in chunks
    and unioned to keep the analyzer tree bounded.
    """
    value_vars = value_vars or [c for c in df.columns if c not in id_vars]
    chunks = [value_vars[i : i + chunk_size] for i in range(0, len(value_vars), chunk_size)]

    def chunk_df(cols: list[str]) -> DataFrame:
        pairs = ", ".join(f"'{c}', CAST(`{c}` AS {value_type})" for c in cols)
        stack_expr = f"stack({len(cols)}, {pairs}) AS (`{var_name}`, `{value_name}`)"
        return df.selectExpr(*[f"`{c}`" for c in id_vars], stack_expr)

    return reduce(lambda a, b: a.unionByName(b), (chunk_df(c) for c in chunks))


def melt_by_suffix(
    df: DataFrame,
    id_vars: list[str],
    suffixes: dict[str, str],
    group_name: str = "area",
    sep: str = "_",
) -> DataFrame:
    """R4: route ``<group><sep><suffix>`` columns into long form —
    one row per (id_vars, group) carrying one measure column per
    suffix. ``suffixes`` maps raw suffix → output measure name.

    The column classification runs driver-side on names only; the
    data-side plan is a union of narrow projections (no shuffle).
    """
    groups: dict[str, dict[str, str]] = {}
    for c in df.columns:
        if c in id_vars:
            continue
        for suffix, measure in suffixes.items():
            if c.endswith(sep + suffix) or c == suffix:
                g = c[: -len(sep + suffix)] if c.endswith(sep + suffix) else ""
                groups.setdefault(g, {})[measure] = c

    legs = []
    for g, found in sorted(groups.items()):
        cols = [F.col(c) for c in id_vars] + [F.lit(g).alias(group_name)]
        for measure in suffixes.values():
            src = found.get(measure)
            cols.append(F.col(src).alias(measure) if src else F.lit(None).cast("double").alias(measure))
        legs.append(df.select(*cols))
    if not legs:
        raise ValueError("no suffix-matched columns found")
    return reduce(lambda a, b: a.unionByName(b), legs)


def pivot_wide(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    value_col: str,
    keys: list[str],
    agg: str = "sum",
) -> DataFrame:
    """long → wide. ``keys`` is mandatory: an unpinned pivot triggers a
    distinct-scan of the key column, and an unbounded key domain is an
    anti-pattern at scale."""
    agg_fn = getattr(F, agg)
    return df.groupBy(*group_cols).pivot(key_col, keys).agg(agg_fn(value_col))


def transpose_small(df: DataFrame, index_col: str, max_rows: int = 10_000) -> DataFrame:
    """R3: true transpose for *small* frames (JRC sheets). Guarded
    collect — transpose is inherently driver-side; at scale you want
    melt+pivot instead."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(f"transpose_small refuses frames larger than {max_rows} rows")
    cols = [c for c in df.columns if c != index_col]
    out_rows = []
    for c in cols:
        out_rows.append((c, *[getattr(r, c) for r in rows]))
    header = [str(getattr(r, index_col)) for r in rows]
    spark = df.sparkSession
    return spark.createDataFrame(out_rows, schema=["variable", *header])


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """R5/K3: union with null-fill for missing columns — the engine's
    schema-evolution primitive (the reference re-reads and
    ``pd.concat``s the whole table on UndefinedColumn,
    /root/reference/crawler/entsoe_crawler.py:196-212; here evolution
    is a zero-copy plan property)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)
