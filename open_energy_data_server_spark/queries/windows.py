"""Window / ordered-operator conformance queries (SURVEY §2.6, W1–W6).

Models: per-series lag-diff de-accumulation (W1,
/root/reference/crawler/ecmwf.py:158-166), latest-row-per-key (W2,
/root/reference/crawler/e2watch.py:166-180), forward/backward fill
(W3, /root/reference/crawler/instrat_pl.py:64-65), snapshot-at-latest
subqueries (W4, weather.json rawSql), top-k (W6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    SCALE,
    _scaled,
    sql_ts_str,
    ts_str,
)


@query(
    "q_lag_diff_decumulate",
    oracle=f"""
    SELECT event_id, user_id, {sql_ts_str("ts")} AS ts,
           GREATEST(value - LAG(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id), 0.0) AS delta
    FROM events
    """,
)
def q_lag_diff_decumulate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+P14: per-series diff with clip-at-zero.

    The reference de-accumulates 24h-cumulative radiation with a
    *global* pandas ``diff()`` that leaks across series boundaries
    (/root/reference/crawler/ecmwf.py:158-166); the window version is
    the correct semantics — PARTITION BY pins the series. Per-row
    double subtraction is deterministic, so no fixed-point needed.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = F.greatest(F.col("value") - F.lag("value").over(w), F.lit(0.0))
    return ev.select("event_id", "user_id", ts_str("ts").alias("ts"), delta.alias("delta"))


@query(
    "q_latest_per_user",
    oracle=f"""
    SELECT user_id, event_id, event_type, {sql_ts_str("ts")} AS ts, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: latest-row-per-key — the 'current state' dashboard query.

    row_number (not max+self-join) → single shuffle on the key. At
    100 TB prefer a date-partition prefilter so the scan doesn't read
    all history to find the newest row.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", ts_str("ts").alias("ts"), "value")
    )


@query(
    "q_ffill_bfill",
    oracle="""
    WITH sparse AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 IN (0, 1) THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
           first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v_bfill
    FROM sparse
    """,
)
def q_ffill_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/P4: forward + backward fill over ordered series.

    ffill = last non-null over an unbounded-preceding row frame,
    per-series (PARTITION BY) — never a global sort. Nulls are
    synthesized deterministically (event_id % 7) since the testdata
    has none.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 7 < 2, F.lit(None).cast("double")).otherwise(F.col("value"))
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wb = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    return ev.withColumn("v", v).select(
        "event_id",
        "user_id",
        F.last("v", ignorenulls=True).over(wf).alias("v_ffill"),
        F.first("v", ignorenulls=True).over(wb).alias("v_bfill"),
    )


@query(
    "q_running_sum",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / {SCALE}.0 AS running_value
    FROM events
    """,
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-series sum (fixed-point: window-sum tree shapes
    differ between engines, so double accumulation would drift)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.round(F.col("value") * SCALE, 0).cast("bigint")).over(w)
    return ev.select(
        "event_id",
        "user_id",
        (running.cast("double") / F.lit(float(SCALE))).alias("running_value"),
    )


@query(
    "q_snapshot_at_latest",
    oracle=f"""
    SELECT event_id, user_id, event_type, {sql_ts_str("ts")} AS ts, value
    FROM events
    WHERE ts = (SELECT MAX(ts) FROM events)
    """,
)
def q_snapshot_at_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: snapshot at the global latest timestamp
    (``WHERE time = (SELECT MAX(time) ...)``, weather.json rawSql)."""
    ev = load_table(spark, sf_dir, "events")
    latest = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.join(F.broadcast(latest), ev.ts == F.col("max_ts"))
        .select("event_id", "user_id", "event_type", ts_str("ts").alias("ts"), "value")
    )


@query(
    "q_topk_per_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 variant: deterministic top-k per group (ties pinned by key)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "q_rolling_1h_window",
    oracle=f"""
    SELECT user_id, {sql_ts_str("ts")} AS ts,
           COUNT(*) OVER w AS n_1h,
           CAST(CAST(SUM(CAST(ROUND(value * 1000000, 0) AS BIGINT)) OVER w AS BIGINT)
             AS DOUBLE) / 1000000.0 AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_1h_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling interval-window aggregates (trailing 1 h per user) — a
    RANGE frame on event time, the time-series op the tumbling/sliding
    set can't express (every event gets ITS OWN trailing window). One
    shuffle on user_id + one in-partition sort; the frame slides
    incrementally over the sorted run. Fixed-point window sum keeps
    the value engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    # microsecond epoch, NOT unix_timestamp: second-truncated order
    # keys make same-second events frame peers and shift the 1 h
    # boundary by up to 1 s — DuckDB's RANGE INTERVAL is µs-precise
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        ts_str("ts").alias("ts"),
        F.count(F.lit(1)).over(w).alias("n_1h"),
        (
            F.sum(F.round(F.col("value") * 1_000_000, 0).cast("bigint")).over(w)
            .cast("double")
            / 1_000_000.0
        ).alias("sum_1h"),
    )


@query(
    "q_scd2_history",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    opened AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           {sql_ts_str("ts")} AS valid_from,
           {sql_ts_str("LEAD(ts) OVER w")} AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version
    FROM opened
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 (operators/scd.py): the per-user event_type change
    stream versioned into validity intervals — consecutive repeats
    collapse, each surviving state carries valid_from / valid_to /
    is_current / version. One exchange on the key serves the change
    lag, the interval lead, and the version number (stacked windows,
    same partitioning). The warehouse-dimension layer above the
    reference's in-place catalog MERGE (K10)."""
    from open_energy_data_server_spark.operators.scd import scd2_history

    ev = load_table(spark, sf_dir, "events")
    hist = scd2_history(
        ev,
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )
    return hist.select(
        "user_id",
        "event_type",
        ts_str("valid_from").alias("valid_from"),
        ts_str("valid_to").alias("valid_to"),
        "is_current",
        "version",
    )


@query(
    "q_scd2_apply",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    opened AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           {sql_ts_str("ts")} AS valid_from,
           {sql_ts_str("LEAD(ts) OVER w")} AS valid_to,
           (LEAD(ts) OVER w IS NULL) AS is_current,
           CAST(ROW_NUMBER() OVER w AS INTEGER) AS version
    FROM opened
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance (operators/scd.py scd2_apply —
    the steady-state dimension load): the history is built from the
    first half of the month, then the second half arrives as a batch
    and folds in. The oracle is the FULL-stream SCD2 SQL — the
    operator's contract is exactly that apply(history(prefix), suffix)
    equals a from-scratch rebuild (the unit suite pins the late-drop
    and equal-ts edge cases the clean split can't reach).

    Plan: untouched keys pass through column-identical with no
    recompute; only keys present in the batch re-run the change
    collapse over (open version ∪ batch) — at 100 TB the window
    touches |changed keys| rows, not the dimension."""
    from open_energy_data_server_spark.operators.scd import (
        scd2_apply,
        scd2_history,
    )

    ev = load_table(spark, sf_dir, "events")
    split = "2024-01-16 00:00:00"
    hist = scd2_history(
        ev.filter(F.col("ts") < split),
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )
    out = scd2_apply(
        hist,
        ev.filter(F.col("ts") >= split).select(
            "user_id", "event_type", "ts", "event_id"
        ),
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        "event_type",
        ts_str("valid_from").alias("valid_from"),
        ts_str("valid_to").alias("valid_to"),
        "is_current",
        "version",
    )


@query(
    "q_percent_rank",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal)
    """,
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing within a group: percent_rank + cume_dist of
    supplier account balance per nation (the scorecard/percentile
    column every ranking dashboard carries). Tied balances share a
    value by SQL semantics, so the result is deterministic without a
    tiebreak. One exchange on the nation key; both functions share
    the single window sort."""
    sup = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    return sup.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "q_weighted_moving_average",
    oracle=f"""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND((value) * {SCALE}, 0) AS BIGINT) AS xs,
             CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS BIGINT) AS rn
      FROM events
    ),
    r AS (
      SELECT user_id, ts, event_id, rn,
             CAST(SUM(xs) OVER w AS BIGINT) AS s0,
             CAST(SUM(rn * xs) OVER w AS BIGINT) AS s1,
             CAST(COUNT(*) OVER w AS BIGINT) AS n
      FROM s
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, {{ts_s}} AS ts_s,
           (CAST(s1 - (rn - n) * s0 AS DOUBLE)
            / CAST(CAST(FLOOR((n * (n + 1)) / 2) AS BIGINT) AS DOUBLE))
           / {SCALE}.0 AS wma24
    FROM r
    """.format(ts_s=sql_ts_str("ts")),
)
def q_weighted_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-weighted 24-sample moving average per series WITHOUT a
    lag chain: the prefix-sum identity
    ``Σ (i-(t-n))·x_i = S1 - (rn-n)·S0`` over rolling sums of ``x``
    and ``rn·x`` — ONE window spec, three shared rolling aggregates,
    all BIGINT fixed-point, so the result is bit-exact on any engine
    and the plan stays a single exchange + single sort per series.
    (Headroom: exact while rn·|x|·10⁶ < 2⁶³ — beyond ~10⁶-sample
    series re-base rn per calendar epoch.) The classic energy-TS
    smoother where recent readings weigh more (weight n for the
    newest sample down to 1 for the oldest in the window)."""
    from open_energy_data_server_spark.operators.rolling import (
        weighted_moving_average,
    )

    ev = load_table(spark, sf_dir, "events")
    out = weighted_moving_average(
        ev.select("user_id", "ts", "event_id", "value"),
        "user_id",
        ["ts", "event_id"],
        "value",
        window=24,
        out_col="wma24",
    )
    return out.select("user_id", "event_id", ts_str("ts").alias("ts_s"), "wma24")


@query(
    "q_runs_detection",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             ROW_NUMBER() OVER (PARTITION BY user_id, (value > 100.0)
                                ORDER BY ts, event_id) AS rf
      FROM events
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS run_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS run_end,
           COUNT(*) AS n_samples,
           MAX(value) AS peak
    FROM flagged
    WHERE value > 100.0
    GROUP BY user_id, rn - rf
    HAVING COUNT(*) >= 2
    """,
)
def q_runs_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-threshold episode detection (gaps-and-islands over a
    predicate): consecutive samples with value > 100 collapse into
    runs with start/end/length/peak, keeping runs of ≥ 2 — the
    high-load / heatwave episode finder an energy dashboard derives
    from any load series. Island id = rn − rn_within_flag, the
    classic two-row_number trick; both windows share ONE sort and the
    series-key exchange, and the episode agg reuses the same
    distribution. All counts/timestamps/max — engine-exact."""
    ev = load_table(spark, sf_dir, "events")
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    perflag = Window.partitionBy("user_id", F.col("value") > 100.0).orderBy(
        "ts", "event_id"
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "value",
        (F.row_number().over(base) - F.row_number().over(perflag)).alias("__grp"),
    ).filter(F.col("value") > 100.0)
    return (
        flagged.groupBy("user_id", "__grp")
        .agg(
            ts_str(F.min("ts")).alias("run_start"),
            ts_str(F.max("ts")).alias("run_end"),
            F.count(F.lit(1)).alias("n_samples"),
            F.max("value").alias("peak"),
        )
        .filter(F.col("n_samples") >= 2)
        .drop("__grp")
    )


@query(
    "q_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY COUNT(*) DESC, event_type) AS rk
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type AS mode_type, n
    FROM c WHERE rk = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per series (most frequent event type, ties to
    the alphabetically first) — the categorical summary column next
    to mean/median in any profile table. Hash agg to (series, type)
    counts, then a row_number top-1 that Spark prunes below the
    exchange via WindowGroupLimit — never a full per-series sort of
    raw rows."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        # asc_nulls_last matches DuckDB's ASC default on the
        # tie-break column
        F.col("n").desc(), F.col("event_type").asc_nulls_last()
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_type"), "n")
    )


# EWMA with alpha=1/2 over an 8-sample memory: integer weights 128>>j
# (exact powers of two), so numerator and denominator are exact BIGINT
# sums on both engines — exponential smoothing with NO transcendentals
_EWMA_MEM = 8
_EWMA_NUM_SQL = " + ".join(
    f"(CASE WHEN LAG(value, {j}) OVER w IS NOT NULL THEN "
    f"{128 >> j} * CAST(ROUND(LAG(value, {j}) OVER w * {SCALE}, 0) AS BIGINT) "
    f"ELSE 0 END)"
    for j in range(_EWMA_MEM)
)
_EWMA_DEN_SQL = " + ".join(
    f"(CASE WHEN LAG(value, {j}) OVER w IS NOT NULL THEN {128 >> j} ELSE 0 END)"
    for j in range(_EWMA_MEM)
)


@query(
    "q_ewma",
    oracle=f"""
    SELECT user_id, event_id, {{ts_s}} AS ts_s,
           (CAST({_EWMA_NUM_SQL} AS DOUBLE)
            / CAST({_EWMA_DEN_SQL} AS DOUBLE)) / {SCALE}.0 AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """.format(ts_s=sql_ts_str("ts")),
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per series, α = 1/2 over
    an 8-sample memory (≥ 99.6 % of the infinite-tail mass): weights
    are the exact integers 128 >> j, so numerator/denominator are
    plain BIGINT folds — exponential smoothing that is engine-bit-
    identical with no pow/exp anywhere (the no-transcendentals rule;
    the WMA identity can't express geometric weights, so this is the
    one place a bounded LAG chain is the right tool). All 8 lags
    share ONE window spec — one exchange + one sort per series,
    whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    num, den = F.lit(0).cast("bigint"), F.lit(0).cast("bigint")
    for j in range(_EWMA_MEM):
        lj = F.lag("value", j).over(w)
        present = lj.isNotNull()
        num = num + F.when(
            present,
            F.lit(128 >> j) * _scaled(F.lag("value", j).over(w)),
        ).otherwise(F.lit(0))
        den = den + F.when(present, F.lit(128 >> j)).otherwise(F.lit(0))
    return ev.select(
        "user_id",
        "event_id",
        ts_str("ts").alias("ts_s"),
        ((num.cast("double") / den.cast("double")) / F.lit(float(SCALE))).alias(
            "ewma"
        ),
    )
