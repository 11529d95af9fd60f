"""Cross-dataset analytics conformance queries: fuzzy record linkage,
load-duration curves, variance-gated anomaly flags, PageRank.

Energy-domain parity: the reference's dashboards chart generation /
load series per area (SURVEY §2.8; e.g. the Grafana panels over
entsoe tables) — the load-duration curve and anomaly gate are the
two classic derived views an energy analyst builds next, expressed
here over the ``events`` table. Linkage and PageRank generalize the
reference's hand-maintained name fixes and nuts_mapper region graph
(/root/reference/crawler/nuts_mapper.py) to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    SCALE,
    _scaled,
    dsum,
    sql_dsum,
    ts_str,
)

# oracle twin of operators.similarity.fixed_round (sign·floor term)
_FR = "CAST(SIGN({z}) * FLOOR(ABS({z}) + 0.5) AS BIGINT)"


@query(
    "q_fuzzy_dedup_names",
    oracle="""
    WITH keys AS (
      SELECT c_custkey AS id, c_name AS name,
             unnest(list_distinct(list_transform(range(0, length(c_name) + 1),
               i -> CASE WHEN i = 0 THEN c_name
                    ELSE substr(c_name, 1, i - 1) || substr(c_name, i + 1) END)))
               AS k
      FROM customer
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                      a.name AS name_a, b.name AS name_b
      FROM keys a JOIN keys b USING (k)
      WHERE a.id < b.id
    )
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    """,
)
def q_fuzzy_dedup_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 record linkage over customer names via
    deletion-neighborhood blocking (operators/fuzzy.py): |corpus|·(L+1)
    skinny variant keys through one self-join — never a pairs² cross
    join — then Levenshtein verification on bucket-mates only."""
    from open_energy_data_server_spark.operators.fuzzy import fuzzy_pairs

    cust = load_table(spark, sf_dir, "customer")
    return fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1)


@query(
    "q_load_duration_curve",
    oracle="""
    WITH cnt AS (
      SELECT event_type, value, COUNT(*) AS hrs
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, value,
           CAST(SUM(hrs) OVER (
             PARTITION BY event_type ORDER BY value DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_hours,
           CAST(CAST(SUM(hrs) OVER (
             PARTITION BY event_type ORDER BY value DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
             / CAST(CAST(SUM(hrs) OVER (PARTITION BY event_type) AS BIGINT) AS DOUBLE)
             AS exceed_frac
    FROM cnt
    """,
)
def q_load_duration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-duration curve per series type: for each observed load
    level, how many hours (rows) meet or exceed it, and the exceedance
    fraction — the classic sorted-demand view of an energy dashboard.

    Scale shape (the quantiles-op insight, PLANS.md §quantiles): rows
    collapse to (type, value) counts in a distributed hash agg FIRST,
    so the cumulative window runs over the bounded distinct-value
    domain (2-decimal measures → ≤49k rows per type regardless of
    corpus size), not over the raw rows — no per-type full sort of
    the fact table, which is the 3-task ceiling the naive ntile plan
    would have.

    Single window pass: the per-type total shares the cumulative
    window's (partitionBy, orderBy) spec with an unbounded frame, so
    Catalyst folds both frames into ONE Window exec — one exchange,
    one sort — instead of a second whole-partition window pass (the
    round-6 plan's 2.25×-at-scale10 constant factor)."""
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("hrs"))
    wc = (
        Window.partitionBy("event_type")
        .orderBy(F.col("value").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = (
        Window.partitionBy("event_type")
        .orderBy(F.col("value").desc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = F.sum("hrs").over(wc)
    tot = F.sum("hrs").over(wt)
    return cnt.select(
        "event_type",
        "value",
        cum.alias("cum_hours"),
        (cum.cast("double") / tot.cast("double")).alias("exceed_frac"),
    )


@query(
    "q_anomaly_outliers",
    oracle=f"""
    WITH st AS (
      SELECT event_id, user_id, value,
             (CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT))
                 OVER (PARTITION BY user_id) AS BIGINT) AS DOUBLE) / {SCALE}.0)
               / CAST(COUNT(*) OVER (PARTITION BY user_id) AS DOUBLE) AS mean_v,
             (CAST(CAST(SUM(CAST(ROUND((value * value) * {SCALE}, 0) AS BIGINT))
                 OVER (PARTITION BY user_id) AS BIGINT) AS DOUBLE) / {SCALE}.0)
               / CAST(COUNT(*) OVER (PARTITION BY user_id) AS DOUBLE) AS ex2
      FROM events
    )
    SELECT event_id, user_id, value, mean_v,
           ex2 - mean_v * mean_v AS var_v
    FROM st
    WHERE (value - mean_v) * (value - mean_v)
          > 4.0 * (ex2 - mean_v * mean_v)
    """,
)
def q_anomaly_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series outlier gate: flag measurements more than 2 standard
    deviations from the series mean — stated square-free as
    (x−mean)² > 4·var, so the whole gate stays in exact-by-construction
    arithmetic (fixed-point window sums for mean and E[x²]; the
    comparison itself is the same IEEE ops in both engines — no sqrt,
    per the engine's no-transcendentals determinism rule).

    Plan: per-series stats as a hash AGGREGATE (map-side partial
    combine → only |users| skinny partial rows shuffle) joined back to
    the events — NOT a whole-partition window, whose exchange moves
    and SORTS every event row per series. The stats side is tiny
    (|users| rows), so AQE broadcasts it at bench scale and the fact
    side never shuffles at all; at 100 TB cardinalities it degrades to
    a shuffled join on the same high-cardinality key — still sort-free
    with AQE's shuffled-hash preference. The sums are exact fixed-point
    bigints, so agg-then-join is bit-identical to the window form
    (measured ~2× faster at sf0.1, PLANS.md r6). The join is
    null-safe (eqNullSafe): a window PARTITION BY keeps NULL-key rows
    as one group, so a plain inner join would silently drop them —
    groupBy likewise keeps NULL as a group, and eqNullSafe matches it
    back, preserving the window form's semantics exactly."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy(F.col("user_id").alias("__uid")).agg(
        F.sum(_scaled("value")).alias("__s1"),
        F.sum(_scaled(F.col("value") * F.col("value"))).alias("__s2"),
        F.count(F.lit(1)).cast("double").alias("__n"),
    )
    mean_v = (F.col("__s1").cast("double") / F.lit(float(SCALE))) / F.col("__n")
    ex2 = (F.col("__s2").cast("double") / F.lit(float(SCALE))) / F.col("__n")
    var_v = ex2 - mean_v * mean_v
    dev2 = (F.col("value") - mean_v) * (F.col("value") - mean_v)
    return (
        ev.join(stats, ev["user_id"].eqNullSafe(stats["__uid"]))
        .select(
            "event_id",
            "user_id",
            "value",
            mean_v.alias("mean_v"),
            var_v.alias("var_v"),
            dev2.alias("__dev2"),
        )
        .filter(F.col("__dev2") > 4.0 * F.col("var_v"))
        .drop("__dev2")
    )


@query(
    "q_pagerank",
    oracle=f"""
    WITH raw AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    und AS (SELECT a, b FROM raw UNION SELECT b AS a, a AS b FROM raw),
    deg AS (SELECT a AS node, COUNT(*) AS deg FROM und GROUP BY a),
    r1 AS (
      SELECT u.b AS node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) * (CAST(SUM({_FR.format(z=f"(CAST(1.0 AS DOUBLE) / CAST(d.deg AS DOUBLE)) * {SCALE}")}) AS DOUBLE) / {SCALE}.0)
               AS rank
      FROM und u JOIN deg d ON u.a = d.node
      GROUP BY u.b
    ),
    r2 AS (
      SELECT u.b AS node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) + CAST(0.85 AS DOUBLE) * (CAST(SUM({_FR.format(z=f"(r1.rank / CAST(d.deg AS DOUBLE)) * {SCALE}")}) AS DOUBLE) / {SCALE}.0)
               AS rank
      FROM und u
      JOIN deg d ON u.a = d.node
      JOIN r1 ON u.a = r1.node
      GROUP BY u.b
    )
    SELECT node, rank FROM r2
    """,
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two PageRank rounds over the customer↔supplier co-order graph
    (operators/graph.py pagerank): per round one skinny edge⋈rank
    join + one map-side-combined hash agg — the Pregel-on-relations
    shape shared with connected_components. Rank sums are fixed-point
    (sign·floor term), so the unrolled SQL twin is bit-identical."""
    from open_energy_data_server_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    return pagerank(edges, "a", "b", iters=2, damping=0.85)


@query(
    "q_capacity_factor",
    oracle=f"""
    WITH agg AS (
      SELECT event_type, CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS day,
             CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS BIGINT)
                  AS DOUBLE) / {SCALE}.0 AS v_sum,
             COUNT(*) AS n,
             MAX(value) AS v_max
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           (v_sum / CAST(n AS DOUBLE)) / v_max AS capacity_factor,
           v_max AS peak, CAST(n AS BIGINT) AS n
    FROM agg
    WHERE v_max > 0.0
    """,
)
def q_capacity_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily capacity factor per series type — mean output over peak
    output, THE utilization metric of energy dashboards. One map-side-
    combined hash agg on (type, day); mean is an exact fixed-point sum
    over the count, max is exact, the ratio is the same IEEE division
    in both engines."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
    ).agg(
        (F.sum(_scaled("value")).cast("double") / F.lit(float(SCALE))).alias("v_sum"),
        F.count(F.lit(1)).alias("n"),
        F.max("value").alias("v_max"),
    )
    return agg.filter(F.col("v_max") > 0.0).select(
        "event_type",
        "day",
        ((F.col("v_sum") / F.col("n").cast("double")) / F.col("v_max")).alias(
            "capacity_factor"
        ),
        F.col("v_max").alias("peak"),
        F.col("n").cast("bigint").alias("n"),
    )


@query(
    "q_ramp_rate",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id, value,
             value - LAG(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS ramp
      FROM events
    )
    SELECT user_id,
           MAX(ABS(ramp)) AS max_abs_ramp,
           CAST(COUNT(ramp) AS BIGINT) AS n_steps
    FROM d
    GROUP BY user_id
    """,
)
def q_ramp_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max absolute ramp (step-to-step change) per series — the grid
    operator's flexibility metric. First differences are exact IEEE
    subtraction of identical operands; ABS/MAX are exact — no fixed
    point needed. One window exchange on the series key + one hash agg
    reusing the same distribution."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.withColumn("ramp", F.col("value") - F.lag("value").over(w))
    return d.groupBy("user_id").agg(
        F.max(F.abs("ramp")).alias("max_abs_ramp"),
        F.count("ramp").cast("bigint").alias("n_steps"),
    )


@query(
    "q_funnel_steps",
    oracle="""
    WITH q0 AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'view' THEN ts END AS q0
      FROM events
    ),
    q1 AS (
      SELECT *, CASE WHEN event_type = 'click'
                      AND MIN(q0) OVER w IS NOT NULL THEN ts END AS q1
      FROM q0
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    q2 AS (
      SELECT *, CASE WHEN event_type = 'purchase'
                      AND MIN(q1) OVER w IS NOT NULL THEN ts END AS q2
      FROM q1
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    per_user AS (
      SELECT user_id, MIN(q0) AS t0, MIN(q1) AS t1, MIN(q2) AS t2
      FROM q2 GROUP BY user_id
    )
    SELECT CAST(COUNT(t0) AS BIGINT) AS step_1_users,
           CAST(COUNT(t1) AS BIGINT) AS step_2_users,
           CAST(COUNT(t2) AS BIGINT) AS step_3_users
    FROM per_user
    """,
)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view → click → purchase (operators/funnel.py):
    users completing each prefix of the sequence in strict time order.
    One exchange for the whole depth — each step's qualifier is a
    running min of the previous step's over a strictly-before frame,
    stacked on a single (user, time) sort — vs the classic k−1
    self-join formulation."""
    from open_energy_data_server_spark.operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        ev,
        "user_id",
        "ts",
        "event_type",
        steps=["view", "click", "purchase"],
        tiebreak_cols=["event_id"],
    )


@query(
    "q_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, ts,
             MIN(ts) OVER (PARTITION BY user_id) AS first_ts
      FROM events
    ),
    marked AS (
      SELECT user_id,
             strftime(date_trunc('month', first_ts), '%Y-%m') AS cohort_month,
             CAST((year(ts) * 12 + month(ts))
                  - (year(first_ts) * 12 + month(first_ts)) AS INTEGER)
               AS month_offset
      FROM firsts
    )
    SELECT cohort_month, month_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM marked GROUP BY cohort_month, month_offset
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-seen month,
    counted in every later month they return (the dashboard behind
    every 'retention' panel). Cohorting is a per-user window min (one
    exchange, reused by the distinct-count agg); month arithmetic is
    integer year*12+month on both engines — no interval/tz drift."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    first_ts = F.min("ts").over(w)
    marked = ev.select(
        "user_id",
        F.date_format(F.date_trunc("month", first_ts), "yyyy-MM").alias(
            "cohort_month"
        ),
        (
            (F.year("ts") * 12 + F.month("ts"))
            - (F.year(first_ts) * 12 + F.month(first_ts))
        )
        .cast("int")
        .alias("month_offset"),
    )
    return marked.groupBy("cohort_month", "month_offset").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )


@query(
    "q_data_gaps",
    oracle="""
    WITH d AS (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT user_id,
           strftime(prev_ts, '%Y-%m-%d %H:%M:%S') AS gap_start,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS gap_end,
           epoch_us(ts) - epoch_us(prev_ts) AS gap_us
    FROM d
    WHERE prev_ts IS NOT NULL
      AND epoch_us(ts) - epoch_us(prev_ts) > 86400000000
    """,
)
def q_data_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-outage detection: reporting gaps > 24 h per series — the
    data-completeness monitor every crawler-fed timeseries DB needs
    (the reference re-crawls ranges it finds missing; this is the
    finding step). One lag window per series, pure projection filter;
    microsecond epoch arithmetic keeps both engines integer-exact."""
    from open_energy_data_server_spark.queries._util import ts_str

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev = F.lag("ts").over(w)
    d = ev.select(
        "user_id",
        ts_str(prev).alias("gap_start"),
        ts_str("ts").alias("gap_end"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(prev)).alias("gap_us"),
    )
    return d.filter(F.col("gap_us") > 86_400_000_000)


@query(
    "q_seasonal_naive_error",
    oracle=f"""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hb,
             (CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / {SCALE}.0) / COUNT(value) AS v
      FROM events GROUP BY 1, 2
    ),
    wv AS (
      SELECT user_id, v,
             MAX(v) OVER (PARTITION BY user_id ORDER BY epoch_us(hb)
                          RANGE BETWEEN 86400000000 PRECEDING
                                    AND 86400000000 PRECEDING) AS v_prev
      FROM hourly
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_fc,
           (CAST(CAST(SUM(CAST(ROUND(ABS(v - v_prev) * {SCALE}, 0) AS BIGINT))
                      AS BIGINT) AS DOUBLE) / {SCALE}.0)
             / CAST(COUNT(*) AS DOUBLE) AS mae
    FROM wv
    WHERE v_prev IS NOT NULL
    GROUP BY user_id
    """,
)
def q_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest per series: predict each hour
    by the same hour yesterday and report the mean absolute error —
    the standard baseline every energy forecaster must beat. The
    24h-ago lookup is a RANGE frame pinned at exactly −24 h over the
    hourly-bucketed series (no self-join — the window reuses the
    bucketing agg's partitioning; missing hours simply yield no
    forecast instead of silently comparing the wrong lag row)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hb")
    ).agg(
        (
            (F.sum(_scaled("value")).cast("double") / F.lit(float(SCALE)))
            / F.count("value")
        ).alias("v")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("hb")))
        .rangeBetween(-86_400_000_000, -86_400_000_000)
    )
    wv = hourly.select("user_id", "v", F.max("v").over(w).alias("v_prev"))
    return (
        wv.filter(F.col("v_prev").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_fc"),
            (
                (
                    F.sum(_scaled(F.abs(F.col("v") - F.col("v_prev"))))
                    .cast("double")
                    / F.lit(float(SCALE))
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("mae"),
        )
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    pairs AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS p
    FROM pairs
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream:
    P(next_type | prev_type) per user-ordered sequence — the behavior
    model behind path dashboards (and the event-stream analog of the
    bigram LM). One (user, time) lag window, one pair hash-agg, and
    the row-probability normalizer is a window over the 25-row agg —
    never a self-join; integer counts make the division exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    )
    pairs = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wn = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(wn).cast("double")
        ).alias("p"),
    )


@query(
    "q_referential_audit",
    oracle="""
    SELECT 'lineitem->orders' AS relationship,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (
                   SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (
                   SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (
                   SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    """,
)
def q_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the fact/dim chain — orphan
    counts per FK relationship, the ingestion-QA sweep a warehouse
    runs after every load (the reference's crawlers fix broken keys by
    hand; this finds them mechanically). Each relationship is ONE scan
    of the child: left-join the broadcast parent key set and count
    rows + null-parent rows in the same aggregate (a left-anti +
    separate full-count would read the child twice)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def audit(name, child, child_key, parent, parent_key):
        joined = child.select(child_key).join(
            F.broadcast(parent.select(parent_key).distinct()),
            child[child_key] == parent[parent_key],
            "left",
        )
        return joined.agg(
            F.lit(name).alias("relationship"),
            F.count(F.lit(1)).cast("bigint").alias("n_child"),
            F.count(F.when(F.col(parent_key).isNull(), 1))
            .cast("bigint")
            .alias("n_orphans"),
        ).select("relationship", "n_child", "n_orphans")

    return (
        audit("lineitem->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionByName(audit("orders->customer", orders, "o_custkey", cust, "c_custkey"))
        .unionByName(audit("customer->nation", cust, "c_nationkey", nation, "n_nationkey"))
    )


@query(
    "q_share_of_total",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                 * {SCALE}, 0) AS BIGINT)) AS BIGINT) AS rev_s
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT region, nation,
           CAST(rev_s AS DOUBLE) / {SCALE}.0 AS revenue,
           CAST(rev_s AS DOUBLE)
             / CAST(SUM(rev_s) OVER (PARTITION BY region) AS DOUBLE) AS region_share
    FROM rev
    """,
)
def q_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total contribution report: each nation's share of
    its region's revenue — the windowed-normalizer pattern (share =
    value / window-sum over the AGGREGATE, never a join back to a
    second aggregation of the same subtree). Fixed-point revenue sums
    keep the shares bit-identical cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(
            F.col("n_name").alias("nation"), F.col("r_name").alias("region")
        )
        .agg(
            F.sum(
                _scaled(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("bigint")
            .alias("rev_s")
        )
    )
    wr = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        (F.col("rev_s").cast("double") / F.lit(float(SCALE))).alias("revenue"),
        (
            F.col("rev_s").cast("double")
            / F.sum("rev_s").over(wr).cast("double")
        ).alias("region_share"),
    )


@query(
    "q_session_entry_paths",
    oracle="""
    WITH s AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT *, SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS sess
      FROM s
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY user_id, sess ORDER BY ts, event_id) AS rn
      FROM g
    ),
    p AS (
      SELECT user_id, sess,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS entry_path
      FROM r WHERE rn <= 3 GROUP BY 1, 2
    )
    SELECT entry_path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY entry_path
    ORDER BY n_sessions DESC, entry_path LIMIT 10
    """,
)
def q_session_entry_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top entry paths: sessionize on 30-min inactivity gaps
    (gaps-and-islands), take each session's first three event types as
    an ordered '>'-joined path, count sessions per path. ONE user
    exchange carries the gap lag, the session running sum, AND the
    in-session row number (rn = user-rank − last session-start rank,
    avoiding a (user, sess) re-window); the path agg's (user, sess)
    clustering is satisfied by the user partitioning, so it adds no
    exchange either. Path strings assemble from an array_sort of
    (ts, event_id) structs — collect_list order is never trusted."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts) > 1_800_000_000),
        1,
    ).otherwise(0)
    g = ev.select(
        "user_id", "ts", "event_id", "event_type",
        new_sess.alias("new_sess"),
        F.row_number().over(w).alias("rn_user"),
    ).select(
        "*",
        F.sum("new_sess").over(run).alias("sess"),
        F.max(F.when(F.col("new_sess") == 1, F.col("rn_user"))).over(run)
        .alias("sess_start_rn"),
    )
    entry = (
        g.filter(F.col("rn_user") - F.col("sess_start_rn") < 3)
        .groupBy("user_id", "sess")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("entry_path")
        )
    )
    return (
        entry.groupBy("entry_path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("entry_path").asc())
        .limit(10)
    )


@query(
    "q_rolling_correlation",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hb,
        (CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT))
              FILTER (event_type = 'view') AS BIGINT) AS DOUBLE) / {SCALE}.0)
          AS x,
        (CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT))
              FILTER (event_type = 'click') AS BIGINT) AS DOUBLE) / {SCALE}.0)
          AS y
      FROM events GROUP BY 1
    ),
    both_present AS (
      SELECT hb, x, y FROM hourly WHERE x IS NOT NULL AND y IS NOT NULL
    ),
    m AS (
      SELECT hb,
        CAST(COUNT(*) OVER w AS DOUBLE) AS n,
        CAST(CAST(SUM(CAST(ROUND(x * {SCALE}, 0) AS BIGINT)) OVER w AS BIGINT) AS DOUBLE) / {SCALE}.0 AS sx,
        CAST(CAST(SUM(CAST(ROUND(y * {SCALE}, 0) AS BIGINT)) OVER w AS BIGINT) AS DOUBLE) / {SCALE}.0 AS sy,
        CAST(CAST(SUM(CAST(ROUND((x * x) * {SCALE}, 0) AS BIGINT)) OVER w AS BIGINT) AS DOUBLE) / {SCALE}.0 AS sxx,
        CAST(CAST(SUM(CAST(ROUND((y * y) * {SCALE}, 0) AS BIGINT)) OVER w AS BIGINT) AS DOUBLE) / {SCALE}.0 AS syy,
        CAST(CAST(SUM(CAST(ROUND((x * y) * {SCALE}, 0) AS BIGINT)) OVER w AS BIGINT) AS DOUBLE) / {SCALE}.0 AS sxy
      FROM both_present
      WINDOW w AS (ORDER BY hb ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(hb, '%Y-%m-%d %H:%M:%S') AS hb,
           CAST(n AS BIGINT) AS n_window,
           CASE WHEN (n * sxx - sx * sx) > 0.0 AND (n * syy - sy * sy) > 0.0
                THEN (n * sxy - sx * sy)
                     / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy))
                END AS corr
    FROM m WHERE n >= 8
    """,
)
def q_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-sample correlation between two hourly series (view
    vs click mean values) — the windowed co-movement statistic behind
    wind-vs-load / price-vs-demand panels. Closed form from SIX
    fixed-point moment sums over ONE ordered frame (n, Σx, Σy, Σx²,
    Σy², Σxy) — sqrt and division are correctly-rounded IEEE ops, so
    the oracle replays every value bit-for-bit; degenerate windows
    (zero variance) yield null. The hourly pivot is one hash-agg; the
    rolling frame is a single global-ordered window over ~10³ bucket
    rows per month (bounded domain, not the raw events)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hb")).agg(
        (
            F.sum(F.when(F.col("event_type") == "view", _scaled("value")))
            .cast("bigint")
            .cast("double")
            / F.lit(float(SCALE))
        ).alias("x"),
        (
            F.sum(F.when(F.col("event_type") == "click", _scaled("value")))
            .cast("bigint")
            .cast("double")
            / F.lit(float(SCALE))
        ).alias("y"),
    )
    both = hourly.filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    w = Window.orderBy("hb").rowsBetween(-23, Window.currentRow)

    def fsum(col):
        return (
            F.sum(_scaled(col)).over(w).cast("bigint").cast("double")
            / F.lit(float(SCALE))
        )

    n = F.count(F.lit(1)).over(w).cast("double")
    sx, sy = fsum(F.col("x")), fsum(F.col("y"))
    sxx = fsum(F.col("x") * F.col("x"))
    syy = fsum(F.col("y") * F.col("y"))
    sxy = fsum(F.col("x") * F.col("y"))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (vx > 0.0) & (vy > 0.0),
        (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy)),
    )
    from open_energy_data_server_spark.queries._util import ts_str

    return (
        both.select(
            "hb",
            n.alias("__n"),
            corr.alias("corr"),
        )
        .filter(F.col("__n") >= 8)
        .select(
            ts_str("hb").alias("hb"),
            F.col("__n").cast("bigint").alias("n_window"),
            "corr",
        )
    )


@query(
    "q_peak_offpeak",
    oracle=f"""
    WITH marked AS (
      SELECT event_type, value,
             CASE WHEN dayofweek(ts) BETWEEN 1 AND 5
                   AND hour(ts) >= 8 AND hour(ts) < 20
                  THEN 'peak' ELSE 'offpeak' END AS tariff
      FROM events
    )
    SELECT event_type, tariff,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS BIGINT)
                AS DOUBLE) / {SCALE}.0 AS total_v,
           (CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS BIGINT)
                 AS DOUBLE) / {SCALE}.0) / CAST(COUNT(*) AS DOUBLE) AS mean_v
    FROM marked GROUP BY 1, 2
    """,
)
def q_peak_offpeak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak/off-peak tariff split (EPEX convention: weekdays 08–20
    local): per-series totals and means under each tariff window — the
    price-formation view every energy dashboard carries. Pure
    projection classifier + one map-side-combined hash agg; DuckDB's
    dayofweek is 0=Sunday..6=Saturday so Mon–Fri is 1..5, matching
    Spark's dayofweek()-in-(2..6)."""
    ev = load_table(spark, sf_dir, "events")
    is_peak = (
        F.dayofweek("ts").isin(2, 3, 4, 5, 6)
        & (F.hour("ts") >= 8)
        & (F.hour("ts") < 20)
    )
    marked = ev.select(
        "event_type",
        "value",
        F.when(is_peak, "peak").otherwise("offpeak").alias("tariff"),
    )
    total = F.sum(_scaled("value")).cast("bigint").cast("double") / F.lit(
        float(SCALE)
    )
    return marked.groupBy("event_type", "tariff").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        total.alias("total_v"),
        (total / F.count(F.lit(1)).cast("double")).alias("mean_v"),
    )


@query(
    "q_degree_days",
    oracle=f"""
    SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {{hdd}} AS hdd, {{cdd}} AS cdd
    FROM events GROUP BY 1, 2
    """.format(
        hdd=sql_dsum("GREATEST(18.0 - value, 0.0)"),
        cdd=sql_dsum("GREATEST(value - 18.0, 0.0)"),
    ),
)
def q_degree_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heating/cooling degree-days per series per day (base 18 °C) —
    the canonical weather-normalization aggregate for energy demand
    models (the reference ships weather series exactly for this
    pairing). GREATEST keeps the gate in exact IEEE arithmetic; the
    daily sums are fixed-point. One partial+final hash agg on
    (series, day) — scan-shaped at any corpus size."""

    ev = load_table(spark, sf_dir, "events")
    hdd = F.greatest(F.lit(18.0) - F.col("value"), F.lit(0.0))
    cdd = F.greatest(F.col("value") - F.lit(18.0), F.lit(0.0))
    return (
        ev.groupBy(
            "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(dsum(hdd).alias("hdd"), dsum(cdd).alias("cdd"))
    )


@query(
    "q_vwap",
    oracle=f"""
    SELECT l_returnflag, strftime(date_trunc('day', l_shipdate), '%Y-%m-%d') AS day,
           ({{num}}) / ({{den}}) AS vwap
    FROM lineitem
    GROUP BY 1, 2
    """.format(
        num=sql_dsum("l_extendedprice * l_quantity"),
        den=sql_dsum("l_quantity"),
    ),
)
def q_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per (flag, day) — THE spot-market
    summary statistic (EPEX day-ahead reporting is VWAP-based; the
    reference stores exactly these price+volume series). Two
    fixed-point sums in one partial+final hash agg; the ratio is a
    single deterministic double division. Scan-shaped at any size."""

    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy(
        "l_returnflag",
        F.date_format(F.date_trunc("day", "l_shipdate"), "yyyy-MM-dd").alias("day"),
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_quantity")).alias("__num"),
        dsum("l_quantity").alias("__den"),
    )
    return g.select(
        "l_returnflag", "day", (F.col("__num") / F.col("__den")).alias("vwap")
    )


@query(
    "q_max_drawdown",
    oracle="""
    WITH r AS (
      SELECT user_id, value,
             MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS run_max
      FROM events
    )
    SELECT user_id, MAX(value) AS peak, MAX(run_max - value) AS max_drawdown
    FROM r GROUP BY user_id
    """,
)
def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per series: largest drop from a running peak —
    the storage/portfolio stress metric (for a battery SoC series:
    deepest discharge from any charge peak). Entirely max/compare
    arithmetic — order-free and engine-exact with NO fixed-point
    needed (each candidate is one IEEE subtraction). The running-max
    window and the final agg share the series-key exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = ev.select(
        "user_id", "value", F.max("value").over(w).alias("run_max")
    )
    return r.groupBy("user_id").agg(
        F.max("value").alias("peak"),
        F.max(F.col("run_max") - F.col("value")).alias("max_drawdown"),
    )


@query(
    "q_rfm_segmentation",
    oracle=f"""
    WITH base AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
             COUNT(*) AS frequency,
             {{rev}} AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, CAST(recency_days AS INTEGER) AS recency_days,
           frequency, monetary,
           (CASE WHEN recency_days <= 365 THEN 3
                 WHEN recency_days <= 1095 THEN 2 ELSE 1 END) * 100
           + (CASE WHEN frequency >= 12 THEN 3
                   WHEN frequency >= 6 THEN 2 ELSE 1 END) * 10
           + (CASE WHEN monetary >= 1200000.0 THEN 3
                   WHEN monetary >= 500000.0 THEN 2 ELSE 1 END) AS rfm
    FROM base
    """.format(rev=sql_dsum("o_totalprice")),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — recency (days since last order,
    vs the corpus max date), frequency, monetary, each scored 1-3 and
    packed as the classic 111-333 segment code. The reference point
    (global max date) is collected at plan-build time and embedded
    (prepared-statement pattern); everything else is ONE hash agg per
    customer plus codegen'd CASEs. Integer day-diffs and fixed-point
    money keep it engine-exact; threshold compares on exact values."""
    o = load_table(spark, sf_dir, "orders")
    ref = o.agg(F.max("o_orderdate")).first()[0]
    base = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(ref), F.max("o_orderdate")).cast("int").alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    r = (
        F.when(F.col("recency_days") <= 365, 3)
        .when(F.col("recency_days") <= 1095, 2)
        .otherwise(1)
    )
    f_ = F.when(F.col("frequency") >= 12, 3).when(F.col("frequency") >= 6, 2).otherwise(1)
    m = (
        F.when(F.col("monetary") >= 1200000.0, 3)
        .when(F.col("monetary") >= 500000.0, 2)
        .otherwise(1)
    )
    return base.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        (r * 100 + f_ * 10 + m).alias("rfm"),
    )


@query(
    "q_shipping_lag",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS total_lag_days,
           CAST(CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS DOUBLE)
             / COUNT(*) AS avg_lag_days,
           CAST(MAX(date_diff('day', o_orderdate, l_shipdate)) AS INTEGER) AS max_lag_days
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per priority class — the fulfilment
    SLA panel. Integer day-diffs sum exactly (no fixed point needed);
    the mean is one deterministic division. Fact⋈fact equi-join on
    the order key (both sides hash-partition on it — the bucketed
    layout in sinks/bucketed.py makes this shuffle-free at scale),
    then a 5-row hash agg."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = o.join(li, o.o_orderkey == li.l_orderkey)
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(lag).cast("bigint").alias("total_lag_days"),
        (F.sum(lag).cast("bigint").cast("double") / F.count(F.lit(1))).alias(
            "avg_lag_days"
        ),
        F.max(lag).cast("int").alias("max_lag_days"),
    )


@query(
    "q_basket_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 25
    """,
)
def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the 25 part pairs most often
    ordered together — the affinity-analysis primitive. Pair
    generation is a self-join on the ORDER key, so fanout per order is
    C(items,2) with items bounded by basket size (≤7 in TPC-H-shaped
    data) — never |parts|²; the blocked-pair-generation argument every
    dedup operator here uses. Top-k is sort+limit
    (TakeOrderedAndProject), deterministic via the total order."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    return (
        pairs.groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(25)
    )


@query(
    "q_yoy_seasonality",
    oracle=f"""
    WITH m AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
             CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mon,
             {{rev}} AS revenue
      FROM orders GROUP BY 1, 2
    )
    SELECT yr, mon, revenue,
           revenue / LAG(revenue) OVER (PARTITION BY mon ORDER BY yr)
             AS yoy_ratio
    FROM m
    """.format(rev=sql_dsum("o_totalprice")),
)
def q_yoy_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year seasonality: monthly revenue vs the SAME month
    one year earlier (LAG partitioned by month-of-year) — the
    seasonal-comparison panel that week-over-week can't express.
    One hash agg to |years|×12 rows; the lag runs over that bounded
    frame, partitioned by calendar month. Ratio of two deterministic
    fixed-point sums; NULL for each month's first year on both
    engines."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mon"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.partitionBy("mon").orderBy("yr")
    return m.select(
        "yr", "mon", "revenue", (F.col("revenue") / F.lag("revenue").over(w)).alias("yoy_ratio")
    )


@query(
    "q_price_volatility",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_id, {{ts_s}} AS ts_s,
             CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) OVER w
               AS BIGINT) AS s1,
             CAST(SUM(CAST(ROUND((value * value) * {SCALE}, 0) AS BIGINT)) OVER w
               AS BIGINT) AS s2,
             CAST(COUNT(*) OVER w AS BIGINT) AS n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts_s,
           (CAST(s2 AS DOUBLE) / {SCALE}.0) / CAST(n AS DOUBLE)
             - ((CAST(s1 AS DOUBLE) / {SCALE}.0) / CAST(n AS DOUBLE))
               * ((CAST(s1 AS DOUBLE) / {SCALE}.0) / CAST(n AS DOUBLE))
             AS var_24
    FROM r
    """.format(ts_s="strftime(ts, '%Y-%m-%d %H:%M:%S')"),
)
def q_price_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-sample price volatility per series, stated as the
    VARIANCE E[x²]−E[x]² (square-free, no sqrt — the
    no-transcendentals rule; dashboards chart σ² or annualize
    downstream). Two fixed-point rolling sums + a count in ONE window
    spec — same single-exchange single-sort shape as the WMA, exact
    BIGINT accumulators, identical IEEE division/multiply sequence in
    the twin."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-23, Window.currentRow)
    )
    s1 = F.sum(_scaled("value")).over(w).cast("bigint")
    s2 = F.sum(_scaled(F.col("value") * F.col("value"))).over(w).cast("bigint")
    n = F.count(F.lit(1)).over(w).cast("bigint")
    r = ev.select(
        "user_id",
        "event_id",
        ts_str("ts").alias("ts_s"),
        s1.alias("s1"),
        s2.alias("s2"),
        n.alias("n"),
    )
    mean = (F.col("s1").cast("double") / F.lit(float(SCALE))) / F.col("n").cast("double")
    ex2 = (F.col("s2").cast("double") / F.lit(float(SCALE))) / F.col("n").cast("double")
    return r.select(
        "user_id", "event_id", "ts_s", (ex2 - mean * mean).alias("var_24")
    )


@query(
    "q_concurrency_sweep",
    oracle="""
    WITH iv AS (
      SELECT ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
    ),
    d AS (
      SELECT s, e,
             unnest(generate_series(date_trunc('day', s), date_trunc('day', e),
                                    INTERVAL 1 DAY)) AS day
      FROM iv
    ),
    deltas AS (
      SELECT day, GREATEST(s, day) AS t, 1 AS delta FROM d
      UNION ALL
      SELECT day, LEAST(e, day + INTERVAL 1 DAY) AS t, -1 AS delta FROM d
    ),
    run AS (
      SELECT day, t,
             CAST(SUM(delta) OVER (PARTITION BY day ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM deltas
    ),
    mx AS (
      SELECT day, t, c, CAST(MAX(c) OVER (PARTITION BY day) AS BIGINT) AS m
      FROM run
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, m AS max_concurrency,
           strftime(MIN(t), '%Y-%m-%d %H:%M:%S') AS peak_time
    FROM mx WHERE c = m GROUP BY day, m
    """,
)
def q_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval sweep-line: peak simultaneous activity per day (each
    event held open 30 min) and the first instant it is reached — the
    'max concurrent sessions' capacity metric no plain aggregate can
    express. Classic +1/−1 delta stream with a running sum; ends sort
    before starts at the same instant (ORDER BY t, delta) so touching
    intervals never double-count.

    Scale shape: intervals are CLIPPED to calendar days (an interval
    spanning midnight contributes clipped deltas to both days), so
    the running-sum window partitions on the day key — parallelism
    grows with the time span and NO global single-partition sweep
    exists anywhere. 2·|events| skinny delta rows from ONE scan
    (struct-array explode), day-keyed exchanges only."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("interval 30 minutes")).alias("e"),
    )
    d = iv.select(
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("day", "s"),
                F.date_trunc("day", "e"),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    # BOTH deltas from one pass: explode a 2-element struct array per
    # clipped interval (a unionAll of two selects would re-run the
    # scan + day-explode once per branch — the no-CTE-materialization
    # hazard; measured 2 scans -> 1)
    deltas = d.select(
        "day",
        F.explode(
            F.array(
                F.struct(
                    F.greatest("s", "day").alias("t"), F.lit(1).alias("delta")
                ),
                F.struct(
                    F.least("e", F.col("day") + F.expr("interval 1 day")).alias(
                        "t"
                    ),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("sd"),
    ).select("day", F.col("sd.t").alias("t"), F.col("sd.delta").alias("delta"))
    wrun = (
        Window.partitionBy("day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = deltas.select(
        "day", "t", F.sum("delta").over(wrun).cast("bigint").alias("c")
    )
    mx = run.withColumn(
        "m", F.max("c").over(Window.partitionBy("day")).cast("bigint")
    )
    return (
        mx.filter(F.col("c") == F.col("m"))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"), F.col("m").alias("max_concurrency"))
        .agg(ts_str(F.min("t")).alias("peak_time"))
    )


@query(
    "q_missing_value_profile",
    oracle="""
    WITH base AS (
      SELECT CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v1,
             event_type, props
      FROM events
    ),
    agg AS (
      SELECT COUNT(*) AS n_rows,
             COUNT(v1) AS nn_v1, COUNT(DISTINCT v1) AS nd_v1,
             COUNT(event_type) AS nn_et, COUNT(DISTINCT event_type) AS nd_et,
             COUNT(props) AS nn_pr, COUNT(DISTINCT props) AS nd_pr
      FROM base
    )
    SELECT 'v1' AS column_name, n_rows, n_rows - nn_v1 AS n_null,
           nd_v1 AS n_distinct,
           CAST(n_rows - nn_v1 AS DOUBLE) / CAST(n_rows AS DOUBLE) AS null_frac
    FROM agg
    UNION ALL
    SELECT 'event_type', n_rows, n_rows - nn_et, nd_et,
           CAST(n_rows - nn_et AS DOUBLE) / CAST(n_rows AS DOUBLE) FROM agg
    UNION ALL
    SELECT 'props', n_rows, n_rows - nn_pr, nd_pr,
           CAST(n_rows - nn_pr AS DOUBLE) / CAST(n_rows AS DOUBLE) FROM agg
    """,
)
def q_missing_value_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the data-quality report a crawler-fed lake
    runs after every load): per-column row/null/distinct counts and
    null fraction, in ONE pass — Spark plans the multi-distinct agg
    via Expand, so three columns profile in a single scan + one
    grouped exchange; the unpivot to per-column rows happens on the
    1-row aggregate (bounded). Nullable column synthesized
    deterministically (the q_null_handling convention — testdata has
    no physical nulls)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v1"),
        "event_type",
        "props",
    )
    agg = base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("v1").alias("nn_v1"),
        F.count_distinct("v1").alias("nd_v1"),
        F.count("event_type").alias("nn_et"),
        F.count_distinct("event_type").alias("nd_et"),
        F.count("props").alias("nn_pr"),
        F.count_distinct("props").alias("nd_pr"),
    )
    # unpivot the SINGLE aggregated row with stack() — a per-column
    # unionAll would re-run the scan and the Expand multi-distinct agg
    # once per branch (measured 3 scans -> 1)
    out = agg.selectExpr(
        """stack(3,
             'v1',         n_rows, n_rows - nn_v1, nd_v1,
             'event_type', n_rows, n_rows - nn_et, nd_et,
             'props',      n_rows, n_rows - nn_pr, nd_pr
           ) AS (column_name, n_rows, n_null, n_distinct)"""
    )
    return out.withColumn(
        "null_frac",
        F.col("n_null").cast("double") / F.col("n_rows").cast("double"),
    )


@query(
    "q_active_users",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
    ),
    dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM pairs GROUP BY day),
    served AS (
      SELECT unnest(generate_series(day, day + INTERVAL 6 DAY,
                                    INTERVAL 1 DAY)) AS day, user_id
      FROM pairs
    ),
    wau AS (SELECT day, COUNT(DISTINCT user_id) AS wau FROM served GROUP BY day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
           CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
    FROM dau d JOIN wau w ON d.day = w.day
    """,
)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    panel. Distinct-over-a-sliding-window isn't window-expressible,
    so each (day, user) pair is EXPLODED to the ≤7 future days it
    serves (bounded fanout — the calendar-scaffold trick in reverse)
    and ONE distinct-count aggregation yields both metrics (dau is
    the off=0 slice). Single scan, single (day, user) distinct;
    trailing days beyond the corpus drop via the dau>0 filter
    (matching the oracle's inner join). All integer counts + one
    deterministic division."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    # ONE aggregation: explode each pair to its 7 served offsets and
    # count dau as the off=0 slice of the same distinct agg — the
    # dau⋈wau twin-branch form re-ran the scan + distinct exchange
    # per branch (measured 2 scans -> 1). dau=0 days (beyond the
    # corpus tail) drop, matching the oracle's inner join.
    served = pairs.select(
        "day",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
    ).select(
        (F.col("day") + F.expr("make_dt_interval(off)")).alias("day"),
        "user_id",
        "off",
    )
    g = served.groupBy("day").agg(
        F.count_distinct(
            F.when(F.col("off") == 0, F.col("user_id"))
        ).alias("dau"),
        F.count_distinct("user_id").alias("wau"),
    )
    return g.filter(F.col("dau") > 0).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@query(
    "q_minmax_scale",
    oracle="""
    WITH st AS (
      SELECT event_id, user_id, value,
             MIN(value) OVER (PARTITION BY user_id) AS mn,
             MAX(value) OVER (PARTITION BY user_id) AS mx
      FROM events
    )
    SELECT event_id, user_id,
           CASE WHEN mx > mn THEN (value - mn) / (mx - mn)
                ELSE CAST('0.5' AS DOUBLE) END AS scaled
    FROM st
    """,
)
def q_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series min-max feature scaling to [0, 1] — the training-
    prep normalization that (unlike z-score) needs NO sqrt, so it is
    engine-exact as plain IEEE subtract/divide on window extrema
    (order-free min/max). Constant series pin to 0.5 on both engines
    instead of dividing by zero. One exchange on the series key; both
    extrema share a single unbounded window spec.

    Plan A/B (r6, PLANS.md): an agg+broadcast-join rewrite measured
    0.24 s vs the window's 0.11 s at sf0.1 and 0.51 s vs 0.11 s at the
    scale10 replica — one skinny shuffle+sort beats double-scan plus
    broadcast build here, so the window form STAYS (the opposite call
    from q_anomaly_outliers, where the stats side is heavier)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mn, mx = F.min("value").over(w), F.max("value").over(w)
    scaled = F.when(
        mx > mn, (F.col("value") - mn) / (mx - mn)
    ).otherwise(F.lit(0.5))
    return ev.select("event_id", "user_id", scaled.alias("scaled"))


@query(
    "q_top_movers",
    oracle="""
    WITH m AS (
      SELECT l_partkey,
             {cur} AS rev_cur,
             {prev} AS rev_prev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-08-01 00:00:00'
      GROUP BY l_partkey
    )
    SELECT l_partkey, rev_cur, rev_prev, rev_cur - rev_prev AS change
    FROM m
    ORDER BY ABS(rev_cur - rev_prev) DESC, l_partkey
    LIMIT 10
    """.format(
        cur=sql_dsum(
            "CASE WHEN l_shipdate >= TIMESTAMP '1997-07-01 00:00:00' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END"
        ),
        prev=sql_dsum(
            "CASE WHEN l_shipdate < TIMESTAMP '1997-07-01 00:00:00' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END"
        ),
    ),
)
def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top movers: the 10 parts with the largest month-over-month
    revenue swing (July vs June 1997) — the 'biggest changes' panel.
    Both months aggregate in ONE conditional-sum pass over a
    shipdate-pruned scan (the filter reaches the parquet reader); the
    global top-10 is sort+limit (TakeOrderedAndProject), total-ordered
    by (|change| DESC, partkey). Fixed-point sums; the change is one
    deterministic subtraction."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1997-06-01 00:00:00").cast("timestamp")
    mid = F.lit("1997-07-01 00:00:00").cast("timestamp")
    hi = F.lit("1997-08-01 00:00:00").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cur = F.when(F.col("l_shipdate") >= mid, rev).otherwise(F.lit(0.0))
    prev = F.when(F.col("l_shipdate") < mid, rev).otherwise(F.lit(0.0))
    m = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_partkey")
        .agg(dsum(cur).alias("rev_cur"), dsum(prev).alias("rev_prev"))
    )
    return (
        m.select(
            "l_partkey",
            "rev_cur",
            "rev_prev",
            (F.col("rev_cur") - F.col("rev_prev")).alias("change"),
        )
        .orderBy(F.abs(F.col("rev_cur") - F.col("rev_prev")).desc(), "l_partkey")
        .limit(10)
    )


@query(
    "q_growth_accounting",
    oracle="""
    WITH actives AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    first_seen AS (
      SELECT user_id, MIN(day) AS f_day FROM actives GROUP BY user_id
    ),
    daily AS (
      SELECT a.day,
             CAST(SUM(CASE WHEN a.day = f.f_day THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
             CAST(SUM(CASE WHEN a.day = f.f_day THEN 0 ELSE 1 END) AS BIGINT)
               AS returning_users
      FROM actives a JOIN first_seen f ON a.user_id = f.user_id
      GROUP BY a.day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day, new_users, returning_users,
           CAST(SUM(new_users) OVER (
             ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM daily
    """,
)
def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, how many active users are NEW
    (first-ever activity) vs RETURNING, plus the cumulative user base —
    the onboarding dashboard every serving deployment wants next to
    DAU (q_active_users).

    Plan: dedupe to (day, user) actives (one hash agg), per-user
    first-seen as a second agg on the SAME user-keyed shuffle, join
    back user-keyed (no extra exchange shape), then the daily rollup is
    |days| rows — the cumulative window runs over that bounded domain,
    never the fact table. Exact integer counts end-to-end."""
    ev = load_table(spark, sf_dir, "events")
    actives = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    first_seen = actives.groupBy("user_id").agg(F.min("day").alias("f_day"))
    daily = (
        actives.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("f_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("day") == F.col("f_day"), 0).otherwise(1))
            .cast("bigint")
            .alias("returning_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "new_users",
        "returning_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )
