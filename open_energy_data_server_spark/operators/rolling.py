"""Rolling weighted aggregates over ordered series.

The linear-weighted moving average (WMA) is computed WITHOUT a lag
chain via the prefix-sum identity

    Σ_{i=t-n+1..t} (i-(t-n))·x_i  =  S1(t) - (rn_t - n_t)·S0(t)

where ``S0``/``S1`` are rolling sums of ``x`` and ``rn·x`` over the
same row frame and ``rn`` is the per-series row number. All three
aggregates share ONE window spec, so the plan is a single exchange on
the series key plus a single sort — versus the n-term LAG chain a
naive translation would emit. Values are fixed-point BIGINTs
(queries/_util rationale), making the result bit-exact on any engine.

Headroom: exact while rn·|x|·10⁶ < 2⁶³; beyond ~10⁶-sample series
re-base ``rn`` per calendar epoch (chunk the series) before applying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.queries._util import SCALE, _scaled


def weighted_moving_average(
    df: DataFrame,
    series_col: str,
    order_cols: list,
    val_col: str,
    window: int = 24,
    out_col: str = "wma",
) -> DataFrame:
    """Append ``out_col``: the trailing linear-WMA of ``val_col`` per
    series (weight ``n`` for the newest sample in the frame down to 1
    for the oldest; partial frames at the series head use the same
    rule over the available ``n`` rows)."""
    wspec = Window.partitionBy(series_col).orderBy(*order_cols)
    s = df.withColumn("__xs", _scaled(val_col)).withColumn(
        "__rn", F.row_number().over(wspec).cast("bigint")
    )
    # ordered by the SAME cols as the row_number window so Catalyst
    # elides the second sort (rn is monotone in this order)
    w = (
        Window.partitionBy(series_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    r = (
        s.withColumn("__s0", F.sum("__xs").over(w).cast("bigint"))
        .withColumn(
            "__s1", F.sum(F.col("__rn") * F.col("__xs")).over(w).cast("bigint")
        )
        .withColumn("__n", F.count(F.lit(1)).over(w).cast("bigint"))
    )
    num = F.col("__s1") - (F.col("__rn") - F.col("__n")) * F.col("__s0")
    denom = (
        F.floor((F.col("__n") * (F.col("__n") + 1)) / 2).cast("bigint").cast("double")
    )
    return (
        r.withColumn(out_col, (num.cast("double") / denom) / F.lit(float(SCALE)))
        .drop("__xs", "__rn", "__s0", "__s1", "__n")
    )
