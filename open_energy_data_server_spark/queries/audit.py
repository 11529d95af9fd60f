"""Data-audit & market-analytics conformance queries: market
concentration (HHI), Pareto/ABC classification, Benford first-digit
auditing, and calendar-scaffold completeness.

Energy-domain parity: the reference serves market data whose canonical
derived views include concentration indices per bidding zone (HHI is
the regulator's standard metric over generation shares) and
data-completeness reports driving re-crawls
(/root/reference/crawler/eview.py re-requests ranges it detects as
missing; q_calendar_scaffold is the detection step as a set
difference, complementing q_data_gaps' lag-based view). Benford
first-digit deviation is the classic audit screen for reported
financial/meter values.

Determinism contract (see _util): fixed-point BIGINT accumulation for
every order-dependent sum; share ratios and per-row products are
single IEEE ops with identical parenthesization in the DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import SCALE, _scaled, ts_str

# scaled-bigint revenue sum (the dsum numerator, without the descale)
_SQL_RS = (
    "CAST(SUM(CAST(ROUND((l_extendedprice * (1 - l_discount)) * "
    f"{SCALE}, 0) AS BIGINT)) AS BIGINT)"
)


@query(
    "q_market_hhi",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, {_SQL_RS} AS rs
      FROM lineitem GROUP BY l_suppkey
    ),
    j AS (
      SELECT s_nationkey, rs,
             CAST(SUM(rs) OVER (PARTITION BY s_nationkey) AS BIGINT) AS ts
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
    )
    SELECT s_nationkey,
           COUNT(*) AS n_suppliers,
           (CAST(CAST(SUM(CAST(ROUND(
              ((CAST(rs AS DOUBLE) / CAST(ts AS DOUBLE))
               * (CAST(rs AS DOUBLE) / CAST(ts AS DOUBLE)))
              * 10000000000.0, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
            / 10000000000.0) * 10000.0 AS hhi
    FROM j GROUP BY s_nationkey
    """,
)
def q_market_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman market-concentration index per nation:
    each supplier's revenue share of its nation, squared and summed,
    on the conventional 0–10000 scale.

    Plan: partial+final hash agg on l_suppkey FIRST (the fact table
    shuffles only |suppliers| scaled-bigint rows, never line items),
    broadcast the supplier dim onto the aggregate, then ONE exchange
    on s_nationkey shared by the total-revenue window and the final
    agg. share² terms are fixed-pointed at 1e-10 before the sum so
    the nation-level reduction is order-free."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_scaled(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("bigint")
        .alias("rs")
    )
    j = rev.join(
        F.broadcast(sup.select(F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
        "l_suppkey",
    )
    ts = F.sum("rs").over(Window.partitionBy("s_nationkey")).cast("bigint")
    share = F.col("rs").cast("double") / F.col("ts").cast("double")
    term = F.round((share * share) * F.lit(1e10), 0).cast("bigint")
    return (
        j.withColumn("ts", ts)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(term).cast("bigint").alias("__h"),
        )
        .select(
            "s_nationkey",
            "n_suppliers",
            ((F.col("__h").cast("double") / F.lit(1e10)) * F.lit(10000.0)).alias("hhi"),
        )
    )


@query(
    "q_abc_classification",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey, {_SQL_RS} AS rs
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      SELECT l_partkey, rs,
             CAST(SUM(rs) OVER (ORDER BY rs DESC, l_partkey
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(SUM(rs) OVER () AS BIGINT) AS tot
      FROM rev
    )
    SELECT l_partkey,
           CAST(rs AS DOUBLE) / {SCALE}.0 AS revenue,
           CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share,
           CASE WHEN cum * 10 <= tot * 7 THEN 'A'
                WHEN cum * 10 <= tot * 9 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c
    """,
)
def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC inventory classification: parts ranked by revenue,
    cumulative-share buckets A (≤70 %), B (≤90 %), C (rest) — the
    classic warehouse triage view.

    Plan: hash agg to one scaled-bigint row per part, then
    ``global_cumsum`` — range-repartition on (rev DESC, partkey) +
    per-partition window sums + driver-collected partition subtotals —
    so the corpus-wide running total needs NO single-partition window
    (the familiarity-ntile precedent, operators/ranking.py). Bucket
    edges compare integers (cum·10 ≤ tot·7), bit-exact on any engine."""
    from open_energy_data_server_spark.operators.ranking import global_cumsum

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(_scaled(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("bigint")
        .alias("rs")
    )
    cum, total = global_cumsum(
        rev, [F.col("rs").desc(), F.col("l_partkey").asc()], "rs", out_col="cum"
    )
    # bucket edges as exact plan-build literals (Python int arithmetic
    # is unbounded): cum*10 <= tot*7  ⇔  cum <= (tot*7)//10 for
    # integers, and the literal form can't overflow int64 at corpus
    # scale the way the in-plan product would (the oracle keeps the
    # product form — equivalent at any scale DuckDB itself can sum)
    thr_a, thr_b = (int(total) * 7) // 10, (int(total) * 9) // 10
    return cum.select(
        "l_partkey",
        (F.col("rs").cast("double") / F.lit(float(SCALE))).alias("revenue"),
        (F.col("cum").cast("double") / F.lit(int(total)).cast("double")).alias(
            "cum_share"
        ),
        F.when(F.col("cum") <= F.lit(thr_a), F.lit("A"))
        .when(F.col("cum") <= F.lit(thr_b), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


# log10(1 + 1/d) for d = 1..9, literal-embedded on BOTH engines (no
# runtime transcendentals — the no-log determinism rule)
_BENFORD = {
    1: "0.30102999566398120",
    2: "0.17609125905568124",
    3: "0.12493873660829993",
    4: "0.09691001300805642",
    5: "0.07918124604762482",
    6: "0.06694678963061322",
    7: "0.05799194697768673",
    8: "0.05115252244738129",
    9: "0.04575749056067514",
}

# quoted-string casts → strtod in DuckDB, bit-identical to Python
# float() (a bare decimal literal would parse as DECIMAL first and can
# convert to double differently — oracle-determinism rule)
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN CAST('{v}' AS DOUBLE)" for d, v in _BENFORD.items()
) + " END"


@query(
    "q_benford_audit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (
      SELECT digit, COUNT(*) AS n_orders,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS tot
      FROM d GROUP BY digit
    )
    SELECT digit, n_orders,
           CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE) AS obs_share,
           {_BENFORD_SQL_CASE} AS benford_share,
           (CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE))
             - {_BENFORD_SQL_CASE} AS deviation
    FROM c
    """,
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit over order totals: observed
    first-significant-digit shares vs the Benford expectation, the
    standard anomaly screen for reported financial/metered values.
    Expected shares are literal-embedded (no runtime log).

    Plan: scan → 9-row hash agg; the corpus-total window runs over the
    ≤9-row POST-aggregation frame (bounded, the snapshot-scalar
    precedent), so nothing corpus-sized ever sees a single partition."""
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    c = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    tot = F.sum("n_orders").over(Window.partitionBy(F.lit(1))).cast("bigint")
    bf = F.when(F.lit(False), F.lit(0.0))
    for dd, vv in _BENFORD.items():
        bf = bf.when(F.col("digit") == dd, F.lit(float(vv)))
    obs = F.col("n_orders").cast("double") / F.col("tot").cast("double")
    return (
        c.withColumn("tot", tot)
        .select(
            "digit",
            "n_orders",
            obs.alias("obs_share"),
            bf.alias("benford_share"),
            (obs - bf).alias("deviation"),
        )
    )


@query(
    "q_calendar_scaffold",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS h0,
             date_trunc('hour', MAX(ts)) AS h1
      FROM events GROUP BY user_id
    ),
    g AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
      FROM b
    ),
    o AS (SELECT DISTINCT user_id, date_trunc('hour', ts) AS hr FROM events)
    SELECT g.user_id, strftime(g.hr, '%Y-%m-%d %H:%M:%S') AS missing_hour
    FROM g
    WHERE NOT EXISTS (
      SELECT 1 FROM o WHERE o.user_id = g.user_id AND o.hr = g.hr
    )
    """,
)
def q_calendar_scaffold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-scaffold completeness: the exact set of missing hourly
    slots per series — generate each series' expected hour grid
    between its first and last report (sequence + explode), anti-join
    the observed hours away. The set-difference complement to
    q_data_gaps' lag-based outage view; its output is the re-crawl
    worklist (reference: eview re-requests detected missing ranges).

    Round-10 optimization (guide §2.4 "remove shuffles outright" +
    §2.3 "don't compute things you throw away"): the missing set is
    exactly the hours strictly inside each gap between CONSECUTIVE
    observed hours, so generate it directly — distinct observed hours,
    one lag window per series, explode only the gap interiors. The
    previous form materialized the FULL |series|·|span-hours| grid and
    anti-joined the observed hours away: 3 exchanges (min/max agg +
    distinct + anti-join) and an exploded row for every present hour
    just to discard it. This form is 2 exchanges — (user_id, hr)
    distinct, then the lag window reusing the user_id partitioning —
    and explodes |missing| rows instead of |grid| (plan diff:
    plans/r10/q_calendar_scaffold_*.txt; 6 → 3 Exchange nodes, no
    LeftAnti). Same result set by construction (grid spans min..max
    observed, so grid ∖ observed ≡ union of gap interiors); the DuckDB
    oracle is unchanged and replays the original grid ∖ observed
    definition."""
    ev = load_table(spark, sf_dir, "events")
    hour = F.expr("interval 1 hour")
    obs = ev.select("user_id", F.date_trunc("hour", "ts").alias("hr")).distinct()
    w = Window.partitionBy("user_id").orderBy("hr")
    gaps = obs.select(
        "user_id", "hr", F.lag("hr").over(w).alias("prev")
    ).filter(F.col("hr") > F.col("prev") + hour)
    missing = gaps.select(
        "user_id",
        F.explode(
            F.sequence(F.col("prev") + hour, F.col("hr") - hour, hour)
        ).alias("hr"),
    )
    return missing.select("user_id", ts_str("hr").alias("missing_hour"))


@query(
    "q_gini_coefficient",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND((o_totalprice) * 100, 0) AS BIGINT))
               AS BIGINT) AS xs
      FROM orders GROUP BY o_custkey
    ),
    rk AS (
      SELECT xs,
             CAST(ROW_NUMBER() OVER (ORDER BY xs, o_custkey) AS BIGINT) AS r,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(xs) OVER () AS BIGINT) AS tot
      FROM rev
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           (CAST(CAST(SUM((2 * r - n - 1) * xs) AS BIGINT) AS DOUBLE)
            / CAST(MAX(tot) AS DOUBLE)) / CAST(MAX(n) AS DOUBLE) AS gini
    FROM rk
    """,
)
def q_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer spend — the inequality summary a
    market regulator reads next to HHI. Closed form over ranked
    values: G = Σ(2r − n − 1)·x_r / (n·Σx), every term an exact
    integer (scaled revenue × exact global rank), so the statistic is
    engine-bit-identical.

    Plan: hash agg to one scaled-BIGINT row per customer, exact global
    rank via ``global_rank`` (range repartition + partition offsets —
    NO single-partition window in the Spark plan; the oracle's OVER ()
    runs on the already-aggregated |customers| frame), then one skinny
    agg with n/total embedded as plan-build literals. Headroom: exact
    while n²·avg_revenue·100 < 2⁶³ (≈10⁵ customers at
    TPC-H-like spend); beyond, chunk ranks per epoch."""
    from open_energy_data_server_spark.operators.ranking import global_rank

    o = load_table(spark, sf_dir, "orders")
    # cent scaling (prices carry exactly 2 decimals, so 100 is already
    # the TRUE exact sum) — the 1e6 default would overflow the
    # rank-weighted sum 10^4x sooner
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("xs")
    )
    ranked, n = global_rank(
        rev, [F.col("xs").asc(), F.col("o_custkey").asc()], out_col="r"
    )
    num = F.sum((2 * F.col("r") - F.lit(n + 1)) * F.col("xs")).cast("bigint")
    tot = F.sum("xs").cast("bigint")
    return ranked.agg(
        F.lit(int(n)).cast("bigint").alias("n_customers"),
        (
            (num.cast("double") / tot.cast("double"))
            / F.lit(int(n)).cast("double")
        ).alias("gini"),
    )
