"""Series interpolation (SURVEY P15).

Models the windmodel power-curve interpolation
(/root/reference/crawler/windmodel.py:83, scipy ``interp1d``).

``interpolate_linear`` is pure window expressions — per-series,
codegen'd, SQL-expressible (the conformance oracle replays it):
for each null row take the last/next known (x, v) neighbours and
evaluate v_prev + (v_next − v_prev)·(x − x_prev)/(x_next − x_prev);
leading/trailing gaps fall back to the single available neighbour.

``interpolate_cubic`` preserves the reference's cubic semantics via
scipy inside applyInPandas — scipy is absent in this container, so it
is import-gated with the contract final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    x_col: str,
    partition_by: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Fill null ``value_col`` by linear interpolation along ``x_col``
    (numeric or timestamp) within each series."""
    out_col = out_col or value_col
    parts = partition_by or []
    x = F.col(x_col)
    xd = x.cast("double")

    base = Window.partitionBy(*parts).orderBy(x_col)
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    v = F.col(value_col)
    known_x = F.when(v.isNotNull(), xd)
    prev_v = F.last(v, ignorenulls=True).over(wb)
    prev_x = F.last(known_x, ignorenulls=True).over(wb)
    next_v = F.first(v, ignorenulls=True).over(wf)
    next_x = F.first(known_x, ignorenulls=True).over(wf)

    interp = prev_v + (next_v - prev_v) * (xd - prev_x) / (next_x - prev_x)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(interp)
    )
    return df.withColumn(out_col, filled)


def interpolate_cubic(
    df: DataFrame,
    value_col: str,
    x_col: str,
    partition_by: list[str],
    out_col: str | None = None,
) -> DataFrame:
    """Cubic-spline interpolation per series (scipy-gated)."""
    try:
        from scipy.interpolate import interp1d  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "interpolate_cubic requires scipy (not in this container); "
            "use interpolate_linear, or install scipy — the applyInPandas "
            "contract is final"
        ) from exc

    import pandas as pd
    from scipy.interpolate import interp1d

    out_col = out_col or value_col
    schema = df.withColumn(out_col, F.col(value_col)).schema

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        known = pdf[pdf[value_col].notna()]
        pdf = pdf.copy()
        if len(known) >= 4:
            f = interp1d(
                known[x_col].astype("float64"),
                known[value_col],
                kind="cubic",
                fill_value="extrapolate",
            )
            pdf[out_col] = f(pdf[x_col].astype("float64"))
        else:
            pdf[out_col] = pdf[value_col].interpolate()
        return pdf

    return df.groupBy(*partition_by).applyInPandas(fit, schema)
