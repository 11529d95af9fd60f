"""As-of (temporal) alignment operators (SURVEY J6, W3, P16).

Models the reference's ``reindex(idx).bfill().ffill()`` FX-rate
alignment (/root/reference/crawler/opec.py:82,
/root/reference/crawler/instrat_pl.py:64-65) and ordered ffill/bfill
(/root/reference/crawler/iwugebaeudetypen.py:56-57).

Implementation is the scalable union-window as-of join: tag both
sides, union, and take ``last(value, ignorenulls)`` over an ordered
window partitioned by the series key. One shuffle on (by, ts) — the
same cost as a sort-merge join — and no driver-side state. Skew lives
in the `by` key, where AQE skew handling applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ffill(
    df: DataFrame,
    cols: list[str],
    order_by: list[str],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Forward-fill nulls over ordered rows, per series."""
    w = (
        Window.partitionBy(*(partition_by or []))
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def bfill(
    df: DataFrame,
    cols: list[str],
    order_by: list[str],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Backward-fill nulls over ordered rows, per series."""
    w = (
        Window.partitionBy(*(partition_by or []))
        .orderBy(*order_by)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    for c in cols:
        df = df.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return df


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    value_cols: list[str],
    by: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """``pd.merge_asof`` semantics: each left row gets the latest
    (direction='backward') or earliest ('forward') right row at-or-
    crossing its key, optionally per `by` group.

    left keeps all its columns; `value_cols` arrive from the right
    (null when nothing matched). Collisions are resolved pandas-style
    by suffixing, but with a right-only convention: a value_col whose
    name already exists on the left is suffixed ``_right`` (repeated
    until free) and the left column keeps its bare name — unlike
    ``pd.merge_asof``'s default ``('_x', '_y')``, which suffixes BOTH
    colliding columns. Ties on the key:
    the right row sorts before the left row, so an exact-equal right
    row DOES match — same as merge_asof's
    ``allow_exact_matches=True`` default.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = by or []

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.col(left_on).alias("__ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.lit(0).alias("__is_left"),
        F.col(right_on).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows (tag 0) sort before left rows (tag 1) at equal ts →
    # exact matches propagate to the left row
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        picker = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        picker = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    # suffix until the name is free of both left.columns and names
    # already assigned to earlier value_cols (e.g. value_cols
    # ['v', 'v_right'] with 'v' on the left would otherwise collide)
    out_name: dict[str, str] = {}
    taken = set(left.columns)
    for c in value_cols:
        name = c
        while name in taken:
            name = f"{name}_right"
        out_name[c] = name
        taken.add(name)
    filled = unioned.select(
        *[F.col(c) for c in unioned.columns if not c.startswith("__r_")],
        *[picker(f"__r_{c}").alias(out_name[c]) for c in value_cols],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left", "__ts")


def resample_calendar(
    df: DataFrame,
    calendar: DataFrame,
    on: str,
    value_cols: list[str],
    fill: str | None = "ffill",
    by: list[str] | None = None,
) -> DataFrame:
    """P16 ``reindex(calendar)`` + optional ffill/bfill — align a
    sparse series onto a dense calendar (calendar side is tiny →
    broadcast left join, then per-series window fill)."""
    by = by or []
    joined = calendar.join(df, on=[on, *by] if by else [on], how="left")
    if fill == "ffill":
        return ffill(joined, value_cols, order_by=[on], partition_by=by)
    if fill == "bfill":
        return bfill(joined, value_cols, order_by=[on], partition_by=by)
    return joined
