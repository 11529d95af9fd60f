"""Round-8 batch 6: cohort economics, temporal self-match, streaks,
and settlement baselines — the last four genres missing from the
monitoring surface (200 queries total).

* cohort LTV — cumulative purchase revenue per first-seen-week cohort
  by week-of-life, per-user normalized (q_retention_cohorts counts
  WHO returns; this accumulates what they are WORTH);
* rapid-repeat detection — same user, same event type, within one
  hour: the double-submit / duplicate-transaction detector, engine
  side as a BANDED hour-bucket self-join (never an interval cross
  join), oracle side as the natural interval self-join;
* activity streaks — longest consecutive-day run per user, histogram
  across the fleet (gaps-and-islands on DISTINCT days; q_runs_
  detection runs over value predicates, this runs over calendars);
* demand-response baseline — the settlement-style "average of the 10
  previous same-hour observations" baseline with MAPE scoring
  (q_seasonal_naive_error uses ONE day back; settlement baselines
  average N, which damps single-day noise).

Exactness: scaled-BIGINT revenue sums; the baseline MAPE keeps an
all-integer numerator/denominator (|10·actual − Σbaseline| / Σ) so
both engines divide identical int64s; every ordering carries a
tiebreak; the repeat-pair predicate breaks ts ties on event_id so the
pair set is a total order either side."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import sql_fmt_dbl

# ---------------------------------------------------------------------------
# q_cohort_ltv


@query(
    "q_cohort_ltv",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events
      GROUP BY 1
    ), sizes AS (
      SELECT date_trunc('week', first_day) AS cohort, COUNT(*) AS cohort_size
      FROM firsts GROUP BY 1
    ), rev AS (
      SELECT f.user_id,
             date_trunc('week', f.first_day) AS cohort,
             CAST((CAST(e.ts AS DATE) - f.first_day) // 7 AS BIGINT)
               AS week_offset,
             CAST(ROUND(e.value * {SCALE}, 0) AS BIGINT) AS sv
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
    ), wk AS (
      SELECT cohort, week_offset, SUM(sv) AS wsv
      FROM rev GROUP BY 1, 2
    ), cum AS (
      SELECT cohort, week_offset,
             SUM(wsv) OVER (PARTITION BY cohort ORDER BY week_offset
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS csv
      FROM wk
    )
    SELECT strftime(CAST(c.cohort AS DATE), '%Y-%m-%d') AS cohort_week,
           c.week_offset,
           CAST(s.cohort_size AS BIGINT) AS cohort_size,
           {sql_fmt_dbl(f"CAST(c.csv AS DOUBLE) / {SCALE}.0")}
             AS cum_revenue,
           {sql_fmt_dbl(
               f"CAST(c.csv AS DOUBLE) / {SCALE}.0 / s.cohort_size"
           )} AS ltv_per_user
    FROM cum c JOIN sizes s ON c.cohort = s.cohort
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: users cohorted by first-seen ISO week,
    purchase revenue accumulated by week-of-life and normalized per
    cohort member — the 'does LTV converge and when' chart behind
    every acquisition-spend decision. Weeks with no purchases simply
    don't appear (both engines derive the identical sparse rollup, so
    the cumulative is well-defined). Plan: one user-keyed first-seen
    agg (broadcast back — it shrinks to |users|), one (cohort, week)
    rollup, then windows and joins over the ≤|cohorts|·|weeks| rollup
    only. Revenue is the scaled-BIGINT exact sum end to end."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    sizes = firsts.groupBy(
        F.date_trunc("week", "first_day").alias("cohort")
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            F.date_trunc("week", "first_day").alias("cohort"),
            F.floor(F.datediff(F.to_date("ts"), F.col("first_day")) / 7)
            .cast("bigint")
            .alias("week_offset"),
            F.round(F.col("value") * SCALE, 0).cast("bigint").alias("sv"),
        )
    )
    wk = rev.groupBy("cohort", "week_offset").agg(F.sum("sv").alias("wsv"))
    w = (
        Window.partitionBy("cohort")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = wk.select(
        "cohort", "week_offset", F.sum("wsv").over(w).alias("csv")
    )
    out = cum.join(F.broadcast(sizes), "cohort")
    csv = F.col("csv").cast("double") / F.lit(float(SCALE))
    return out.select(
        F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        F.col("cohort_size").cast("bigint").alias("cohort_size"),
        F.round(csv, 6).alias("cum_revenue"),
        F.round(csv / F.col("cohort_size"), 6).alias("ltv_per_user"),
    )


# ---------------------------------------------------------------------------
# q_rapid_repeat_events

_RR_WINDOW_SEC = 3600


@query(
    "q_rapid_repeat_events",
    oracle=f"""
    WITH pairs AS (
      SELECT e1.event_type,
             e1.user_id,
             date_diff('second', e1.ts, e2.ts) AS gap
      FROM events e1 JOIN events e2
        ON e1.user_id = e2.user_id AND e1.event_type = e2.event_type
       AND (e2.ts > e1.ts OR (e2.ts = e1.ts AND e2.event_id > e1.event_id))
       AND date_diff('second', e1.ts, e2.ts) <= {_RR_WINDOW_SEC}
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(CAST(gap AS BIGINT)) AS BIGINT) AS total_gap_seconds
    FROM pairs GROUP BY 1
    """,
)
def q_rapid_repeat_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid-repeat detection: pairs of SAME-user, SAME-type events
    within {_RR_WINDOW_SEC} s of each other — the double-submit /
    duplicate-transaction screen. The oracle states the natural
    interval self-join; the engine runs a BANDED self-join instead:
    each event keys on its hour bucket, the probe side fans out to
    (bucket, bucket+1), and the join is a plain equi-join on
    (user, type, bucket) with the interval test as a post-filter —
    per-key fanout is bounded by per-user-per-hour activity, so at
    100 TB the pair search stays an equi-join (the LSH-banding
    discipline of the dedup suite applied to TIME). Tie pairs
    (identical ts) are ordered by event_id so both engines count the
    identical pair set; gaps count second-boundary crossings."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.floor(F.unix_timestamp("ts") / _RR_WINDOW_SEC)
        .cast("bigint")
        .alias("bucket"),
    )
    probe = ev.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("t"),
        F.col("ts").alias("ts_a"),
        F.col("event_id").alias("id_a"),
        F.explode(
            F.array(F.col("bucket"), F.col("bucket") + 1)
        ).alias("bucket"),
    )
    build = ev.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("t"),
        F.col("ts").alias("ts_b"),
        F.col("event_id").alias("id_b"),
        "bucket",
    )
    ts_a, ts_b = F.col("ts_a"), F.col("ts_b")
    pairs = (
        probe.join(build, ["u", "t", "bucket"])
        .where(
            (
                (ts_b > ts_a)
                | ((ts_b == ts_a) & (F.col("id_b") > F.col("id_a")))
            )
            # each pair matches exactly once: the join key must equal
            # b's own bucket, and the probe emits (bucket_a,
            # bucket_a+1) — a single one of which can equal it
            & (
                F.unix_timestamp(ts_b) - F.unix_timestamp(ts_a)
                <= _RR_WINDOW_SEC
            )
        )
        .select(
            F.col("t").alias("event_type"),
            F.col("u").alias("user_id"),
            (F.unix_timestamp(ts_b) - F.unix_timestamp(ts_a)).alias("gap"),
        )
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("gap").cast("bigint").alias("total_gap_seconds"),
    )


# ---------------------------------------------------------------------------
# q_activity_streaks


@query(
    "q_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), isl AS (
      SELECT user_id,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS grp
      FROM days
    ), runs AS (
      SELECT user_id, COUNT(*) AS len FROM isl GROUP BY user_id, grp
    ), mx AS (
      SELECT user_id, MAX(len) AS max_streak FROM runs GROUP BY 1
    )
    SELECT CAST(max_streak AS BIGINT) AS max_streak_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM mx GROUP BY 1
    """,
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user, histogrammed
    across the fleet — the engagement 'streak' metric. Gaps-and-
    islands on DISTINCT (user, day): consecutive days share
    day − row_number (integer day arithmetic, no timestamps), so a
    streak is one group. Every stage is keyed on user_id (distinct →
    window → two aggs share the partitioning); the histogram is
    bounded by the observation span in days."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.select(
        "user_id",
        (F.datediff("d", F.lit("2024-01-01")) - F.row_number().over(w)).alias(
            "grp"
        ),
    )
    runs = isl.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    mx = runs.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return mx.groupBy(
        F.col("max_streak").cast("bigint").alias("max_streak_days")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


# ---------------------------------------------------------------------------
# q_dr_baseline — 10-previous-same-hour settlement baseline + MAPE

_DR_N = 10


@query(
    "q_dr_baseline",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             EXTRACT(hour FROM ts) AS hod,
             SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS sv
      FROM events GROUP BY 1, 2, 3
    ), based AS (
      SELECT event_type, sv,
             SUM(sv) OVER (PARTITION BY event_type, hod ORDER BY day
               ROWS BETWEEN {_DR_N} PRECEDING AND 1 PRECEDING) AS bs,
             COUNT(*) OVER (PARTITION BY event_type, hod ORDER BY day
               ROWS BETWEEN {_DR_N} PRECEDING AND 1 PRECEDING) AS bn
      FROM hourly
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           {sql_fmt_dbl(
               "CAST(SUM(CAST(ROUND(CAST(ABS(sv * " + str(_DR_N) + " - bs)"
               " AS DOUBLE) / bs * 1000000, 0) AS BIGINT)) AS DOUBLE)"
               " / 1000000.0 / COUNT(*)"
           )} AS mape
    FROM based
    WHERE bn = {_DR_N} AND bs > 0
    GROUP BY 1
    """,
)
def q_dr_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Settlement-style demand-response baseline: each (series, hour)
    observation is scored against the AVERAGE of the {_DR_N} previous
    same-hour observations (the '10-of-10' customer-baseline method),
    reported as per-series MAPE. q_seasonal_naive_error uses one day
    back; averaging {_DR_N} damps single-day noise, which is why
    settlement uses it. Only fully-baselined rows (exactly {_DR_N}
    priors) score. Exactness: the relative error is
    |{_DR_N}·actual − Σbaseline| / Σbaseline — an all-integer
    numerator and denominator divided once as doubles, then
    fixed-point-averaged. The windows run over the bounded
    (series, hour, day) rollup, partitioned on (series, hour) —
    24·|series| independent slices."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hod"),
    ).agg(F.sum(F.round(F.col("value") * SCALE, 0).cast("bigint")).alias("sv"))
    w = (
        Window.partitionBy("event_type", "hod")
        .orderBy("day")
        .rowsBetween(-_DR_N, -1)
    )
    based = hourly.select(
        "event_type",
        "sv",
        F.sum("sv").over(w).alias("bs"),
        F.count(F.lit(1)).over(w).alias("bn"),
    )
    sv, bs = F.col("sv"), F.col("bs")
    ape = F.abs(sv * _DR_N - bs).cast("double") / bs
    return (
        based.where((F.col("bn") == _DR_N) & (bs > 0))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.round(
                F.sum(F.round(ape * 1_000_000, 0).cast("bigint")).cast(
                    "double"
                )
                / 1_000_000.0
                / F.count(F.lit(1)),
                6,
            ).alias("mape"),
        )
    )
