"""Round-8 batch 3: seasonality strength, cross-series lead–lag
correlation, and survival-style churn hazard.

Three analytics genres the monitoring surface did not yet cover: a
variance-decomposition seasonality score (is the hour-of-day profile
signal or noise?), cross-correlation between two series at signed
lags (does one series LEAD the other?), and a lifecycle hazard table
(of users who reached week w, what fraction stopped there?). Same
oracle-parity discipline as round8b: exact fixed-point/integer
reductions, closed forms spelled identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import fmt_dbl, sql_fmt_dbl

# ---------------------------------------------------------------------------
# q_seasonality_strength


@query(
    "q_seasonality_strength",
    oracle=f"""
    WITH base AS (
      SELECT event_type, value,
             CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) OVER
                    (PARTITION BY event_type, EXTRACT(hour FROM ts))
                  AS DOUBLE) / {SCALE}.0
               / COUNT(*) OVER (PARTITION BY event_type, EXTRACT(hour FROM ts))
               AS s,
             CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) OVER
                    (PARTITION BY event_type) AS DOUBLE) / {SCALE}.0
               / COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_fmt_dbl(
               "1.0 - CAST(SUM(CAST(ROUND((value - s) * (value - s) * 100, 0)"
               " AS BIGINT)) AS DOUBLE)"
               " / CAST(SUM(CAST(ROUND((value - m) * (value - m) * 100, 0)"
               " AS BIGINT)) AS DOUBLE)"
           )} AS seasonal_strength
    FROM base GROUP BY 1
    """,
)
def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-decomposition seasonality score per series:
    1 − Var(x − s)/Var(x − m) with s the exact hour-of-day mean and m
    the series mean (the STL 'strength of seasonality' statistic,
    computed without STL). Near 0 ⇒ the daily profile is noise; near
    1 ⇒ the profile explains the series — the statistic that decides
    whether q_seasonal_profile's output is worth charting. Both
    means come from exact fixed-point sums; the squared deviations
    are rounded per row before the BIGINT sum (×100 keeps dev² · rows
    inside 2⁶³ at bench scale).

    Round-10 plan (guide §2.3 "aggregate before you shuffle"): the
    previous form computed s and m as WINDOW sums — two exchanges of
    every row (hash by (type, hod), then by (type)). But the means
    are (type, hod)-level facts: one map-side-combined aggregate
    produces the |types|·24 stats table, the per-type totals roll up
    from it EXACTLY (integer sums of integer partials — the same
    BIGINT every direct per-type sum yields), and two broadcast joins
    attach s/m back to a second scan. Full-row exchanges 2 → 0; the
    only exchanges left are the two tiny aggregate partials. Same
    IEEE-754 arithmetic per row (cast-to-double of identical BIGINTs,
    same division order), so the result is bit-identical and the
    oracle is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    stats = (
        ev.groupBy(F.col("event_type"), F.hour("ts").alias("__hod"))
        .agg(
            F.sum(F.round(F.col("value") * SCALE, 0).cast("bigint")).alias("__sv"),
            F.count(F.lit(1)).alias("__cnt"),
        )
    )
    s_tbl = stats.select(
        "event_type",
        "__hod",
        (
            F.col("__sv").cast("double") / F.lit(float(SCALE)) / F.col("__cnt")
        ).alias("s"),
    )
    m_tbl = (
        stats.groupBy("event_type")
        .agg(F.sum("__sv").alias("__tv"), F.sum("__cnt").alias("__tc"))
        .select(
            "event_type",
            (
                F.col("__tv").cast("double") / F.lit(float(SCALE)) / F.col("__tc")
            ).alias("m"),
        )
    )
    # null-safe joins: a NULL event_type / NULL hour partitions
    # together under a window, so the join-back must too
    s_j = s_tbl.select(
        F.col("event_type").alias("__et_s"), F.col("__hod").alias("__hod_s"), "s"
    )
    m_j = m_tbl.select(F.col("event_type").alias("__et_m"), "m")
    rows = ev.select("event_type", "value", F.hour("ts").alias("__hod"))
    base = (
        rows.join(
            F.broadcast(s_j),
            rows["event_type"].eqNullSafe(s_j["__et_s"])
            & rows["__hod"].eqNullSafe(s_j["__hod_s"]),
        )
        .join(F.broadcast(m_j), rows["event_type"].eqNullSafe(m_j["__et_m"]))
        .select("event_type", "value", "s", "m")
    )
    dev_s = F.col("value") - F.col("s")
    dev_m = F.col("value") - F.col("m")

    def ssq(dev):
        return F.sum(F.round(dev * dev * 100, 0).cast("bigint")).cast("double")

    return base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        fmt_dbl(1.0 - ssq(dev_s) / ssq(dev_m)).alias("seasonal_strength"),
    )


# ---------------------------------------------------------------------------
# q_cross_correlation

_XC_A, _XC_B = "click", "purchase"
_XC_LAGS = (-2, -1, 0, 1, 2)


def _sql_xcorr_leg(lag: int) -> str:
    shifted = f"LAG(b_cnt, {lag})" if lag >= 0 else f"LEAD(b_cnt, {-lag})"
    return f"""
      SELECT {lag} AS lag, COUNT(*) AS n,
             SUM(a_cnt) AS sx, SUM(b_sh) AS sy, SUM(a_cnt * b_sh) AS sxy,
             SUM(a_cnt * a_cnt) AS sxx, SUM(b_sh * b_sh) AS syy
      FROM (
        SELECT a_cnt, {shifted} OVER (ORDER BY hr) AS b_sh FROM hourly
      ) WHERE b_sh IS NOT NULL
    """


@query(
    "q_cross_correlation",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), scaffold AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM bounds
    ), hourly AS (
      SELECT s.hr,
             COALESCE(a.cnt, 0) AS a_cnt,
             COALESCE(b.cnt, 0) AS b_cnt
      FROM scaffold s
      LEFT JOIN (SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS cnt
                 FROM events WHERE event_type = '{_XC_A}' GROUP BY 1) a
        ON s.hr = a.hr
      LEFT JOIN (SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS cnt
                 FROM events WHERE event_type = '{_XC_B}' GROUP BY 1) b
        ON s.hr = b.hr
    ), moments AS (
      {" UNION ALL ".join(_sql_xcorr_leg(lag) for lag in _XC_LAGS)}
    )
    SELECT lag, CAST(n AS BIGINT) AS n,
           {sql_fmt_dbl(
               "CAST(n * sxy - sx * sy AS DOUBLE)"
               " / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
               "    * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))"
           )} AS xcorr
    FROM moments
    """,
)
def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between two series ({_XC_A} vs {_XC_B}
    hourly counts) at signed lags −2…+2 — the lead–lag detector
    (positive-lag peak ⇒ the first series LEADS). Same machinery as
    q_autocorr_lag: scaffold-densified hourly counts, exact integer
    moment sums, closed-form r; all five lags come from ONE window
    pass (lag −k is lead +k over the same ordering, stacked then
    reduced in a single agg). The single-series window is over the
    bounded hourly rollup (|hours| rows total)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    scaffold = F.broadcast(bounds).select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )

    # ONE conditional-aggregate scan yields both series (the oracle
    # keeps its two-subquery formulation — independent plan shapes)
    both = (
        ev.where(F.col("event_type").isin(_XC_A, _XC_B))
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(
            F.count(F.when(F.col("event_type") == _XC_A, 1)).alias("a_raw"),
            F.count(F.when(F.col("event_type") == _XC_B, 1)).alias("b_raw"),
        )
    )
    hourly = scaffold.join(both, "hr", "left").select(
        "hr",
        F.coalesce("a_raw", F.lit(0)).alias("a_cnt"),
        F.coalesce("b_raw", F.lit(0)).alias("b_cnt"),
    )
    w = Window.orderBy("hr")
    shifted = hourly.select(
        "a_cnt",
        *[
            (
                F.lag("b_cnt", lag) if lag >= 0 else F.lead("b_cnt", -lag)
            ).over(w).alias(f"b_{i}")
            for i, lag in enumerate(_XC_LAGS)
        ],
    )
    stack_args = ", ".join(f"{lag}, b_{i}" for i, lag in enumerate(_XC_LAGS))
    stacked = shifted.select(
        "a_cnt",
        F.expr(f"stack({len(_XC_LAGS)}, {stack_args}) AS (lag, b_sh)"),
    ).where(F.col("b_sh").isNotNull())
    m = stacked.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a_cnt").alias("sx"),
        F.sum("b_sh").alias("sy"),
        F.sum(F.col("a_cnt") * F.col("b_sh")).alias("sxy"),
        F.sum(F.col("a_cnt") * F.col("a_cnt")).alias("sxx"),
        F.sum(F.col("b_sh") * F.col("b_sh")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    r = (n * sxy - sx * sy).cast("double") / (
        F.sqrt((n * sxx - sx * sx).cast("double"))
        * F.sqrt((n * syy - sy * sy).cast("double"))
    )
    return m.select("lag", n.cast("bigint").alias("n"), fmt_dbl(r).alias("xcorr"))


# ---------------------------------------------------------------------------
# q_churn_hazard


@query(
    "q_churn_hazard",
    oracle="""
    WITH life AS (
      SELECT user_id,
             CAST((MAX(CAST(ts AS DATE)) - MIN(CAST(ts AS DATE))) // 7
                  AS BIGINT) AS last_week
      FROM events GROUP BY 1
    ), churned AS (
      SELECT last_week AS week, COUNT(*) AS n_churned
      FROM life GROUP BY 1
    ), at_risk AS (
      SELECT c.week,
             (SELECT COUNT(*) FROM life l WHERE l.last_week >= c.week)
               AS n_at_risk
      FROM churned c
    )
    SELECT c.week,
           CAST(a.n_at_risk AS BIGINT) AS n_at_risk,
           CAST(c.n_churned AS BIGINT) AS n_churned,
           ROUND(CAST(c.n_churned AS DOUBLE) / a.n_at_risk, 6) AS hazard
    FROM churned c JOIN at_risk a ON c.week = a.week
    """,
)
def q_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time survival hazard by lifetime week: of the users
    whose activity span reached week w, what fraction had their LAST
    event in week w (the churn table behind every retention model;
    q_retention_cohorts gives the calendar view, this gives the
    lifecycle view). Per-user first/last reduce in one agg; the
    at-risk counts come from a cumulative sum over the |weeks|-row
    week rollup ordered DESCENDING (at_risk(w) = Σ_{{w'≥w}}
    churned(w') — users exit observation exactly once), so nothing
    beyond the user agg ever touches data-sized rows. Pure integer
    arithmetic until the final division."""
    ev = load_table(spark, sf_dir, "events")
    life = ev.groupBy("user_id").agg(
        (
            F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts")))
            / F.lit(7)
        )
        .cast("bigint")
        .alias("last_week")
    )
    churned = life.groupBy(F.col("last_week").alias("week")).agg(
        F.count(F.lit(1)).alias("n_churned")
    )
    w = Window.orderBy(F.col("week").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tab = churned.select(
        "week",
        F.sum("n_churned").over(w).alias("n_at_risk"),
        "n_churned",
    )
    return tab.select(
        "week",
        "n_at_risk",
        "n_churned",
        F.round(
            F.col("n_churned").cast("double") / F.col("n_at_risk"), 6
        ).alias("hazard"),
    )


# ---------------------------------------------------------------------------
# q_forecast_backtest

_FB_TRAIN_DAYS = 20  # idx 0..19 train, the rest test


@query(
    "q_forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS BIGINT) AS sv
      FROM events GROUP BY 1, 2
    ), idxd AS (
      SELECT event_type, sv,
             CAST(day - MIN(day) OVER (PARTITION BY event_type) AS BIGINT)
               AS idx
      FROM daily
    ), m AS (
      SELECT event_type,
             COUNT(*) AS n, SUM(idx) AS sx, SUM(sv) AS sy,
             SUM(idx * sv) AS sxy, SUM(idx * idx) AS sxx
      FROM idxd WHERE idx < {_FB_TRAIN_DAYS} GROUP BY 1
    ), fit AS (
      SELECT event_type,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
             (CAST(sy AS DOUBLE)
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n
               AS icept
      FROM m
    ), err AS (
      SELECT t.event_type,
             (CAST(t.sv AS DOUBLE) - (f.icept + f.slope * t.idx))
               / {SCALE}.0 AS e
      FROM idxd t JOIN fit f ON t.event_type = f.event_type
      WHERE t.idx >= {_FB_TRAIN_DAYS}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(CAST(SUM(CAST(ROUND(ABS(e) * {SCALE}, 0) AS BIGINT))
                      AS DOUBLE) / {SCALE}.0 / COUNT(*), 6) AS mae,
           ROUND(SQRT(CAST(SUM(CAST(ROUND(e * e * 100, 0) AS BIGINT))
                           AS DOUBLE) / 100.0 / COUNT(*)), 6) AS rmse
    FROM err GROUP BY 1
    """,
)
def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest per series: OLS trend fit on the first
    {_FB_TRAIN_DAYS} days of exact daily totals, evaluated on the
    held-out remainder (MAE + RMSE) — the genre every capacity
    planner runs before trusting a trend line, and the evaluation
    loop q_corr_regression's fit feeds. Exactness chain: daily totals
    are scaled BIGINTs; OLS moments are pure BIGINT sums (bounded:
    n·Σ(idx·sv) ≲ 5e16 « 2⁶³ at scale10); the closed-form
    slope/intercept divide identical int64s cast to double, so both
    engines derive bit-identical predictions; per-row errors are
    rounded before the fixed-point MAE/RMSE sums. Everything after
    the one daily rollup runs on |days|-bounded relations with the
    fit broadcast back."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * SCALE, 0).cast("bigint")).alias("sv"))
    )
    idxd = daily.select(
        "event_type",
        "sv",
        F.datediff(
            "day", F.min("day").over(Window.partitionBy("event_type"))
        ).cast("bigint").alias("idx"),
    )
    m = (
        idxd.where(F.col("idx") < _FB_TRAIN_DAYS)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("idx").alias("sx"),
            F.sum("sv").alias("sy"),
            F.sum(F.col("idx") * F.col("sv")).alias("sxy"),
            F.sum(F.col("idx") * F.col("idx")).alias("sxx"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope = (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
    fit = m.select(
        "event_type",
        slope.alias("slope"),
        ((sy.cast("double") - slope * sx.cast("double")) / n).alias("icept"),
    )
    err = (
        idxd.where(F.col("idx") >= _FB_TRAIN_DAYS)
        .join(F.broadcast(fit), "event_type")
        .select(
            "event_type",
            (
                (
                    F.col("sv").cast("double")
                    - (F.col("icept") + F.col("slope") * F.col("idx"))
                )
                / F.lit(float(SCALE))
            ).alias("e"),
        )
    )
    e = F.col("e")
    return err.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(
            F.sum(F.round(F.abs(e) * SCALE, 0).cast("bigint")).cast("double")
            / F.lit(float(SCALE))
            / F.count(F.lit(1)),
            6,
        ).alias("mae"),
        F.round(
            F.sqrt(
                F.sum(F.round(e * e * 100, 0).cast("bigint")).cast("double")
                / 100.0
                / F.count(F.lit(1))
            ),
            6,
        ).alias("rmse"),
    )
