"""Series interpolation (SURVEY P15).

Models the windmodel power-curve interpolation
(/root/reference/crawler/windmodel.py:83, scipy ``interp1d``).

``interpolate_linear`` is pure window expressions — per-series,
codegen'd, SQL-expressible (the conformance oracle replays it):
for each null row take the last/next known (x, v) neighbours and
evaluate v_prev + (v_next − v_prev)·(x − x_prev)/(x_next − x_prev);
leading/trailing gaps fall back to the single available neighbour.

``interpolate_cubic`` preserves the reference's cubic semantics
(``interp1d(kind='cubic')`` = cubic spline with NOT-A-KNOT boundary
conditions, extrapolating the end polynomial pieces) with a
self-contained numpy implementation inside applyInPandas — no scipy
needed. The spline solve is per-series (a power curve is dozens of
knots), so each group's dense solve is microseconds; the distribution
unit is the series key, the same partitioning any per-series model fit
uses at scale. When scipy IS present it is used directly, keeping
bit-compatibility with the reference's exact code path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    x_col: str,
    partition_by: list[str] | None = None,
    out_col: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Fill null ``value_col`` by linear interpolation along ``x_col``
    (numeric or timestamp) within each series. Pass ``tiebreak`` (a
    unique column) when ``x_col`` can carry duplicates — the ROWS
    frames' last/first values are peer-order-dependent otherwise."""
    out_col = out_col or value_col
    parts = partition_by or []
    x = F.col(x_col)
    xd = x.cast("double")

    order = [x_col] + ([tiebreak] if tiebreak else [])
    base = Window.partitionBy(*parts).orderBy(*order)
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


def notaknot_spline_eval(
    xk: np.ndarray, yk: np.ndarray, xe: np.ndarray
) -> np.ndarray:
    """Evaluate the not-a-knot cubic spline through (xk, yk) at xe.

    Moment (second-derivative) formulation: interior continuity rows
    are the classic tridiagonal system; the first/last rows impose
    third-derivative continuity across the second and second-to-last
    knots (the not-a-knot condition scipy's ``interp1d(kind='cubic')``
    uses). Points beyond the knot range evaluate the end polynomial
    piece — scipy's ``fill_value='extrapolate'`` behavior. Requires
    ≥ 4 strictly increasing knots. Exact for cubic polynomials (the
    property the tests pin)."""
    xk = np.asarray(xk, dtype=np.float64)
    yk = np.asarray(yk, dtype=np.float64)
    n = xk.size
    if n < 4:
        raise ValueError("not-a-knot spline needs >= 4 knots")
    h = np.diff(xk)
    if (h <= 0).any():
        raise ValueError("spline knots must be strictly increasing")
    # The moment system is tridiagonal except the two not-a-knot rows
    # (third-derivative continuity across x1 / x_{n-2}), which couple
    # three unknowns each. Fold them in analytically —
    #   M0      = ((h0+h1)·M1 − h0·M2) / h1
    #   M_{n-1} = ((h_{n-2}+h_{n-3})·M_{n-2} − h_{n-2}·M_{n-3}) / h_{n-3}
    # — leaving a pure tridiagonal system over M1..M_{n-2}, solved by
    # the Thomas algorithm in O(n) (a dense solve would be O(n³) per
    # series: fatal for the ~500-knot series the conformance query
    # runs this on).
    slopes = np.diff(yk) / h
    m_inner = n - 2
    a = np.empty(m_inner)
    b = np.empty(m_inner)
    c = np.empty(m_inner)
    d = 6.0 * np.diff(slopes)
    a[:] = h[:-1]
    b[:] = 2.0 * (h[:-1] + h[1:])
    c[:] = h[1:]
    b[0] = 2.0 * (h[0] + h[1]) + h[0] * (h[0] + h[1]) / h[1]
    c[0] = h[1] - h[0] * h[0] / h[1]
    a[-1] = h[-2] - h[-1] * h[-1] / h[-2]
    b[-1] = 2.0 * (h[-2] + h[-1]) + h[-1] * (h[-1] + h[-2]) / h[-2]
    for k in range(1, m_inner):
        w = a[k] / b[k - 1]
        b[k] -= w * c[k - 1]
        d[k] -= w * d[k - 1]
    x_sol = np.empty(m_inner)
    x_sol[-1] = d[-1] / b[-1]
    for k in range(m_inner - 2, -1, -1):
        x_sol[k] = (d[k] - c[k] * x_sol[k + 1]) / b[k]
    m = np.empty(n)
    m[1:-1] = x_sol
    m[0] = ((h[0] + h[1]) * m[1] - h[0] * m[2]) / h[1]
    m[-1] = ((h[-1] + h[-2]) * m[-2] - h[-1] * m[-3]) / h[-2]

    idx = np.clip(np.searchsorted(xk, xe) - 1, 0, n - 2)
    x0, x1 = xk[idx], xk[idx + 1]
    hi = x1 - x0
    m0, m1 = m[idx], m[idx + 1]
    y0, y1 = yk[idx], yk[idx + 1]
    return (
        (m0 * (x1 - xe) ** 3 + m1 * (xe - x0) ** 3) / (6.0 * hi)
        + (y0 / hi - m0 * hi / 6.0) * (x1 - xe)
        + (y1 / hi - m1 * hi / 6.0) * (xe - x0)
    )


def interpolate_cubic(
    df: DataFrame,
    value_col: str,
    x_col: str,
    partition_by: list[str],
    out_col: str | None = None,
    use_scipy: bool | None = None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """Cubic-spline interpolation per series (not-a-knot, scipy-equal).

    ``pre_partitioned=True`` declares that every series' rows are
    already co-located within single input partitions (the CALLER's
    responsibility — e.g. a generator that lays series out
    contiguously, or an upstream repartition on the series key). The
    fit then runs as ONE ``mapInPandas`` pass per partition with an
    in-kernel groupby — zero exchange and one Python task per
    partition instead of a hash repartition plus one Arrow group per
    series (guide §4: fewer, larger batches across the boundary). The
    per-series fit function is byte-identical in both modes.

    Duplicate x knots within a series are collapsed to their mean value
    before the fit (a strictly-increasing knot vector is a spline
    precondition; two events with identical ts would otherwise abort
    the whole job on the scipy-free path). Fewer than 4 distinct known
    knots per series falls back to linear fill.

    ``use_scipy``: None (default) prefers scipy's interp1d when
    importable — bit-compatible with the reference's exact code path;
    False forces the built-in evaluator regardless (the conformance
    query pins its committed fixture to the built-in's exact float
    behavior, which scipy's different solve order would perturb in the
    last ulp); True requires scipy and raises if absent."""
    import pandas as pd

    interp1d = None
    if use_scipy is not False:
        try:
            from scipy.interpolate import interp1d
        except ImportError:
            if use_scipy is True:
                raise

    out_col = out_col or value_col
    schema = df.withColumn(out_col, F.col(value_col).cast("double")).schema

    # pin the shuffle width: AQE's partition coalescing sees a few MB
    # of series data and folds the exchange to 1-2 tasks, serializing
    # every group through two Python workers (measured 5× on 150
    # series). An explicit repartition on the group key keeps full
    # parallelism (explicit numPartitions is exempt from coalescing)
    # and already satisfies the groupBy's required distribution, so no
    # second exchange is planned.
    if not pre_partitioned:
        n_tasks = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(n_tasks, *[F.col(c) for c in partition_by])

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        known = pdf[pdf[value_col].notna()]
        pdf = pdf.copy()
        if len(known) == 0:
            pdf[out_col] = np.nan
            return pdf
        kx = known[x_col].astype("float64").to_numpy()
        kv = known[value_col].astype("float64").to_numpy()
        # collapse duplicate x to the mean value — deterministic
        # regardless of shuffle-dependent row order (np.unique sorts;
        # for an all-unique series this is exactly the sorted (x, v))
        ux, inv, counts = np.unique(kx, return_inverse=True, return_counts=True)
        sums = np.zeros_like(ux)
        np.add.at(sums, inv, kv)
        uy = sums / counts
        xe = pdf[x_col].astype("float64").to_numpy()
        if ux.size >= 4:
            if interp1d is not None:
                f = interp1d(ux, uy, kind="cubic", fill_value="extrapolate")
                pdf[out_col] = f(xe)
            else:
                pdf[out_col] = notaknot_spline_eval(ux, uy, xe)
        else:
            # linear-in-x fallback (flat-extended at the ends) — sorted
            # by x, NOT positional: applyInPandas row order within a
            # group is shuffle-dependent, so positional interpolation
            # would be nondeterministic and leading gaps would never fill
            pdf[out_col] = np.interp(xe, ux, uy)
        return pdf

    if pre_partitioned:

        def fit_partition(batches):
            # a partition may arrive as several Arrow batches that
            # split a series — concat first (bounded: one partition),
            # then run the identical per-series fit
            chunks = list(batches)
            if not chunks:
                return
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if len(chunks) > 1
                else chunks[0]
            )
            for _, grp in pdf.groupby(partition_by, sort=False, dropna=False):
                yield fit(grp)

        return df.mapInPandas(fit_partition, schema)

    return df.groupBy(*partition_by).applyInPandas(fit, schema)
