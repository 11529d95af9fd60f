"""Aggregation conformance queries (SURVEY §2.5, A1–A10).

Models: time-bucketed dashboard aggregation (A2,
/root/reference/data/provisioning/grafana/dashboards/refit.json:111),
multi-measure panels (A3, entsoe.json:1248), watermark probes (A5,
/root/reference/crawler/entsoe_crawler.py:241-247), distinct dimension
extraction (A6, /root/reference/crawler/entsoe_crawler.py:497-503),
keep-first dedup (A7, /root/reference/crawler/smard.py:168-171),
histogram counts (A8, jao.json rawSql), catalog stats sweep (A9/A10,
/root/reference/docs/source/examples/metadata_sql_helpers.sql:1-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    SCALE,
    davg,
    dsum,
    sql_davg,
    sql_dsum,
    sql_ts_str,
    ts_str,
)


@query(
    "q_time_bucket_hourly",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           COUNT(*) AS n,
           {sql_davg("value")} AS avg_value,
           {sql_dsum("value")} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_time_bucket_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: TimescaleDB ``time_bucket('1 hour', ts)`` + avg/sum.

    Exercises the engine's registered ``time_bucket`` SQL function
    (session.register_engine_functions) through the SQL surface — the
    same shape every Grafana dashboard panel uses. Single hash-agg
    exchange; bucket expression is codegen'd, no UDF.
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    # group on the BUCKET TIMESTAMP and render the string on the few
    # thousand aggregated groups — formatting inside the grouping
    # expression would run the string conversion per input row
    # (measured 2× on the whole query at ~1M rows)
    return spark.sql(
        f"""
        SELECT date_format(bucket_ts, 'yyyy-MM-dd HH:mm:ss') AS bucket,
               event_type, n, avg_value, sum_value
        FROM (
          SELECT time_bucket(3600, ts) AS bucket_ts,
                 event_type,
                 COUNT(*) AS n,
                 CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS DOUBLE) / {SCALE}.0
                   / COUNT(value) AS avg_value,
                 CAST(CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS BIGINT)
                   AS DOUBLE) / {SCALE}.0 AS sum_value
          FROM events
          GROUP BY 1, 2
        )
        """
    )


@query(
    "q_multi_measure_by_type",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dsum("value")} AS sum_value,
           {sql_davg("value")} AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q_multi_measure_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: one wide agg with heterogeneous measures per group."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value").alias("sum_value"),
        davg("value").alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "q_watermark_probe",
    oracle=f"""
    SELECT {sql_ts_str("MIN(ts)")} AS first_ts,
           {sql_ts_str("MAX(ts)")} AS last_ts,
           COUNT(*) AS n
    FROM events
    """,
)
def q_watermark_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/T1: scalar min/max watermark probe — the crawl resume point.

    At 100 TB this should read partition metadata, not data; on a
    date-partitioned lake the same probe is a listing operation.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        ts_str(F.min("ts")).alias("first_ts"),
        ts_str(F.max("ts")).alias("last_ts"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_distinct_dims",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    """,
)
def q_distinct_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: SELECT DISTINCT → dimension table extraction."""
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "q_dedup_keep_first",
    oracle=f"""
    SELECT user_id, event_type, event_id, {sql_ts_str("ts")} AS ts, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/K9: keep-first dedup on a key with an explicit ordering.

    The reference relies on incidental pandas order
    (/root/reference/crawler/smard.py:168-171); distributed semantics
    require pinning the order column — (ts, event_id) here. One shuffle
    on the dedup key; at scale this is the write-path PK enforcement.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", ts_str("ts").alias("ts"), "value")
    )


@query(
    "q_value_histogram",
    oracle="""
    SELECT CAST(FLOOR(value / 50) AS INTEGER) AS bucket, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: histogram-style count over a derived bucket (jao.json shape)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 50).cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_catalog_stats",
    oracle=f"""
    SELECT 'orders' AS tbl, COUNT(*) AS n_rows,
           {sql_ts_str("MIN(o_orderdate)")} AS t_min, {sql_ts_str("MAX(o_orderdate)")} AS t_max
    FROM orders
    UNION ALL
    SELECT 'lineitem', COUNT(*), {sql_ts_str("MIN(l_shipdate)")}, {sql_ts_str("MAX(l_shipdate)")}
    FROM lineitem
    UNION ALL
    SELECT 'events', COUNT(*), {sql_ts_str("MIN(ts)")}, {sql_ts_str("MAX(ts)")}
    FROM events
    """,
)
def q_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/A10: per-table row count + temporal extent sweep.

    The reference does this as a dynamic PL/pgSQL loop over every
    timestamp column (metadata_sql_helpers.sql:1-63); here it is a
    driver-side loop over the catalog emitting one union-all plan —
    each leg scans only its time column (column pruning).
    """
    legs = []
    for tbl, ts_col in (("orders", "o_orderdate"), ("lineitem", "l_shipdate"), ("events", "ts")):
        legs.append(
            load_table(spark, sf_dir, tbl).agg(
                F.lit(tbl).alias("tbl"),
                F.count(F.lit(1)).alias("n_rows"),
                ts_str(F.min(ts_col)).alias("t_min"),
                ts_str(F.max(ts_col)).alias("t_max"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


@query(
    "q_net_generation",
    oracle=f"""
    WITH measures AS (
      SELECT user_id,
             {sql_dsum("CASE WHEN event_type = 'view' THEN value END")} AS aggregated_mwh,
             {sql_dsum("CASE WHEN event_type = 'click' THEN value END")} AS consumption_mwh
      FROM events GROUP BY user_id
    )
    SELECT user_id, aggregated_mwh, consumption_mwh,
           COALESCE(aggregated_mwh, 0.0) - COALESCE(consumption_mwh, 0.0) AS net_mwh
    FROM measures
    """,
)
def q_net_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13 signature op: ENTSO-E net generation = actual_aggregated −
    actual_consumption with null-as-zero semantics
    (/root/reference/crawler/entsoe_crawler.py:80-118)."""
    ev = load_table(spark, sf_dir, "events")
    agg = dsum(F.when(F.col("event_type") == "view", F.col("value")))
    cons = dsum(F.when(F.col("event_type") == "click", F.col("value")))
    out = ev.groupBy("user_id").agg(
        agg.alias("aggregated_mwh"), cons.alias("consumption_mwh")
    )
    return out.select(
        "user_id",
        "aggregated_mwh",
        "consumption_mwh",
        (
            F.coalesce("aggregated_mwh", F.lit(0.0)) - F.coalesce("consumption_mwh", F.lit(0.0))
        ).alias("net_mwh"),
    )


@query(
    "q_union_cte_count",
    oracle="""
    WITH all_bids AS (
      SELECT user_id, CAST(FLOOR(CAST(FLOOR(value) AS INTEGER) / 10) AS INTEGER) AS days
      FROM events WHERE event_type = 'click'
      UNION
      SELECT user_id, CAST(FLOOR(CAST(FLOOR(value) AS INTEGER) / 10) AS INTEGER)
      FROM events WHERE event_type = 'view'
    )
    SELECT days, COUNT(*) AS n FROM all_bids GROUP BY days
    """,
)
def q_union_cte_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jao.json rawSql shape: UNION (distinct!) CTE over two bid
    tables, then COUNT grouped by a derived duration bucket
    (``productMinutesDelivered/60/24 AS days``)."""
    ev = load_table(spark, sf_dir, "events")
    days = F.floor(F.floor("value").cast("int") / 10).cast("int").alias("days")

    def leg(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select("user_id", days)

    return (
        leg("click")
        .union(leg("view"))
        .distinct()
        .groupBy("days")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_json_extract_agg",
    oracle="""
    SELECT CAST(FLOOR(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
                AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: JSON-API payload flattening — extract a typed field from a
    JSON string column (the reference flattens nested API JSON at
    ingest, /root/reference/crawler/e2watch.py:131-152). The numeric
    parse goes through DOUBLE + FLOOR on both engines: a direct
    string→INTEGER cast ROUNDS in DuckDB ('3.7'→4) but NULLs in
    non-ANSI Spark, and errors on non-numeric payloads — the
    double-then-floor form gives both engines identical truncation
    and NULL-on-garbage semantics."""
    ev = load_table(spark, sf_dir, "events")
    k = F.floor(F.get_json_object("props", "$.k").cast("double")).cast("bigint")
    return ev.groupBy((k % 10).alias("k_mod")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_approx_distinct_kmv",
    oracle="""
    WITH hashed AS (
      SELECT DISTINCT l_returnflag,
             CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
      FROM lineitem
    ),
    topk AS (
      SELECT l_returnflag, h,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
      FROM hashed
    ),
    st AS (
      SELECT l_returnflag, COUNT(*) AS m, MAX(h) AS hk
      FROM topk WHERE rn <= 128 GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(m AS BIGINT) AS n_seen,
           CASE WHEN m < 128 THEN CAST(m AS DOUBLE)
                ELSE 127.0 * 1152921504606846976.0 / CAST(hk AS DOUBLE) END
             AS est_distinct
    FROM st
    """,
)
def q_approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx-distinct via the deterministic KMV sketch (k=128):
    distinct parts shipped per returnflag. Unlike HLL the estimate is
    a pure function of the shared md5 hash base, so the DuckDB oracle
    replays it bit-for-bit — a sketch under the exact-value gate."""
    from open_energy_data_server_spark.operators.sketch import kmv_distinct

    li = load_table(spark, sf_dir, "lineitem")
    return kmv_distinct(li, ["l_returnflag"], "l_partkey", k=128)


@query(
    "q_rollup_revenue",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n, {sql_dsum("l.l_extendedprice")} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level ROLLUP (region → nation → grand total) — the
    hypertable-rollup/continuous-aggregate query shape. One shuffle:
    Spark expands the grouping sets map-side and aggregates all three
    levels in a single hash agg; the dimension joins are broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    j = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    return j.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("revenue")
    )


@query(
    "q_quantiles_disc",
    oracle="""
    SELECT l_returnflag,
           quantile_disc(l_extendedprice, 0.25) AS p25,
           quantile_disc(l_extendedprice, 0.50) AS p50,
           quantile_disc(l_extendedprice, 0.90) AS p90,
           quantile_disc(l_quantity, 0.50) AS qty_median
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_quantiles_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles per group (dashboard staple). DISC, not
    CONT: the result is an actual data value, so no interpolation
    arithmetic to diverge between engines — exact under the value-hash
    gate where t-digest/interpolated forms are not.

    Formulation: two-phase exact quantile (operators/quantiles.py) —
    distributed per-(flag, value) counts, a tiny coarse histogram
    collected as bounded driver metadata, then ranking ONLY inside the
    one bucket containing each ceil(p·n) rank. No window ever
    partitions on the 3-value flag over more than a bucket's worth of
    values (the round-1 ≤3-task-sort ceiling, removed for good —
    bucket width shrinks as n_buckets grows). NOT the built-in
    ``percentile_disc`` agg: Spark runs one sort-based agg PER call
    (4 sorts of the table)."""
    from open_energy_data_server_spark.operators.quantiles import quantile_disc

    li = load_table(spark, sf_dir, "lineitem")
    price = quantile_disc(
        li, "l_returnflag", "l_extendedprice",
        [(0.25, "p25"), (0.50, "p50"), (0.90, "p90")],
    )
    qty = quantile_disc(li, "l_returnflag", "l_quantity", [(0.50, "qty_median")])
    return price.join(F.broadcast(qty), "l_returnflag")


_PSUM = "CAST(SUM(CAST(ROUND(({expr}) * {s}, 0) AS BIGINT)) AS BIGINT)"


@query(
    "q_corr_regression",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST({_PSUM.format(expr="l_extendedprice", s=100)} AS DOUBLE) / 100.0 AS sx,
             CAST({_PSUM.format(expr="l_quantity", s=100)} AS DOUBLE) / 100.0 AS sy,
             CAST({_PSUM.format(expr="l_extendedprice * l_quantity", s=100)} AS DOUBLE) / 100.0 AS sxy,
             CAST({_PSUM.format(expr="l_extendedprice * l_extendedprice", s=100)} AS DOUBLE) / 100.0 AS sxx,
             CAST({_PSUM.format(expr="l_quantity * l_quantity", s=100)} AS DOUBLE) / 100.0 AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (n * sxy - sx * sy) / (SQRT(GREATEST(n * sxx - sx * sx, 0))
                                  * SQRT(GREATEST(n * syy - sy * sy, 0)))
             AS corr_price_qty,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept
    FROM m
    """,
)
def q_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + least-squares line per group — the stat
    aggregates dashboards lean on, made ORDER-INDEPENDENT: Spark's
    built-in corr()/regr_slope() accumulate doubles (shuffle order
    changes the bits), so the moments Σx, Σy, Σxy, Σx², Σy² are exact
    fixed-point BIGINT sums (×100; bounded: max price² · 100 · 600k
    rows ≈ 7e17 « 2⁶³ — at larger SF switch the moments to
    DECIMAL(38)) and the closed forms evaluate identically on both
    engines. One partial+final hash agg, scan-bound."""
    li = load_table(spark, sf_dir, "lineitem")

    def psum(col, s=100):
        return F.sum(F.round(col * s, 0).cast("bigint")).cast("double") / float(s)

    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        psum(x).alias("sx"),
        psum(y).alias("sy"),
        psum(x * y).alias("sxy"),
        psum(x * x).alias("sxx"),
        psum(y * y).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = [F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")]
    cov_n = n * sxy - sx * sy
    slope = cov_n / (n * sxx - sx * sx)
    # clamp the variance terms at 0: independently-rounded moments can
    # land a hair negative for a near-constant group, and DuckDB's
    # SQRT hard-errors on negatives (Spark would yield NaN)
    var_x = F.greatest(n * sxx - sx * sx, F.lit(0.0))
    var_y = F.greatest(n * syy - sy * sy, F.lit(0.0))
    return m.select(
        "l_returnflag",
        (cov_n / (F.sqrt(var_x) * F.sqrt(var_y))).alias(
            "corr_price_qty"
        ),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
    )


@query(
    "q_skew_salted_agg",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n, {sql_dsum("l_extendedprice")} AS revenue
    FROM lineitem GROUP BY 1
    """,
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tolerant two-phase aggregation (operators/skew.py,
    SURVEY §4 — the reference's DE-dominated country keys): the
    3-value returnflag is exactly the hot-key shape where one reducer
    would own a third of the table; salting spreads each key over 16
    reducers and the algebraic combine reproduces the plain GROUP BY
    bit-for-bit (exact integer partial sums are order- and
    salt-invariant), which the oracle verifies."""
    from open_energy_data_server_spark.constants import SCALE
    from open_energy_data_server_spark.operators.skew import salted_groupby

    li = load_table(spark, sf_dir, "lineitem")
    scaled = F.round(F.col("l_extendedprice") * SCALE, 0).cast("bigint")
    return salted_groupby(
        li.select("l_returnflag", "l_extendedprice"),
        keys=["l_returnflag"],
        partial_aggs=[
            F.count(F.lit(1)).alias("pn"),
            F.sum(scaled).alias("ps"),
        ],
        final_aggs=[
            F.sum("pn").alias("n"),
            (F.sum("ps").cast("double") / F.lit(float(SCALE))).alias("revenue"),
        ],
    )


def _qcont_sql(picks: list[tuple[float, str]]) -> str:
    """Build the manual type-7 interpolation oracle (NOT DuckDB's
    native quantile_cont — the arithmetic must be pinned by our SQL):
    h=(n-1)*p, v[floor(h)+1] + (h-floor(h))*(v[floor(h)+2]-v[floor(h)+1])."""
    sel, out = [], []
    for p, alias in picks:
        h = f"((n - 1) * {p})"
        r1 = f"(CAST(FLOOR({h}) AS BIGINT) + 1)"
        r2 = f"(CASE WHEN {h} > FLOOR({h}) AND {r1} < n THEN {r1} + 1 ELSE {r1} END)"
        sel.append(f"MIN(CASE WHEN rn = {r1} THEN v END) AS lo_{alias}")
        sel.append(f"MIN(CASE WHEN rn = {r2} THEN v END) AS hi_{alias}")
        sel.append(f"MIN({h} - FLOOR({h})) AS f_{alias}")
        out.append(f"lo_{alias} + f_{alias} * (hi_{alias} - lo_{alias}) AS {alias}")
    return f"""
    WITH c AS (
      SELECT l_returnflag AS g, l_extendedprice AS v FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
             COUNT(*) OVER (PARTITION BY g) AS n
      FROM c
    ),
    sel AS (SELECT g, {", ".join(sel)} FROM r GROUP BY g)
    SELECT g AS l_returnflag, {", ".join(out)} FROM sel
    """


_QCONT_PICKS = [(0.25, "p25"), (0.50, "p50"), (0.75, "p75")]


@query("q_quantiles_cont", oracle=_qcont_sql(_QCONT_PICKS))
def q_quantiles_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated (type-7, the pandas/np default) quantiles per
    group via the two-phase histogram plan (operators.quantiles
    .quantile_cont): same scale shape as the DISC path — the heavy
    shuffle keys on (group, value), only the two target buckets per
    quantile are ranked — plus one deterministic lerp. The oracle
    spells the interpolation arithmetic out (no engine-native
    quantile_cont on either side), so doubles hash-match."""
    from open_energy_data_server_spark.operators.quantiles import quantile_cont

    li = load_table(spark, sf_dir, "lineitem")
    return quantile_cont(li, "l_returnflag", "l_extendedprice", _QCONT_PICKS)


@query(
    "q_cms_heavy_hitters",
    oracle=r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ),
    truec AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM toks GROUP BY tok
    ),
    top AS (
      SELECT tok, true_count FROM truec
      ORDER BY true_count DESC, tok LIMIT 20
    ),
    js AS (SELECT CAST(unnest(range(4)) AS INTEGER) AS j),
    counters AS (
      SELECT j,
             CAST(CAST('0x' || substr(md5(j || ':' || tok), 1, 15) AS BIGINT)
                  % 256 AS INTEGER) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks, js GROUP BY 1, 2
    ),
    probes AS (
      SELECT top.tok, top.true_count, js.j,
             CAST(CAST('0x' || substr(md5(js.j || ':' || top.tok), 1, 15) AS BIGINT)
                  % 256 AS INTEGER) AS bucket
      FROM top, js
    )
    SELECT p.tok, p.true_count,
           CAST(MIN(c.cnt) AS BIGINT) AS cms_count
    FROM probes p JOIN counters c ON p.j = c.j AND p.bucket = c.bucket
    GROUP BY p.tok, p.true_count
    """,
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-sketch point queries for the corpus's 20 most
    frequent tokens (operators/sketch.py cms_counters/cms_estimate,
    d=4 × w=256): true count beside the sketch overestimate. The
    sketch is a constant-size mergeable counter table built in one
    map-side-combined agg — the heavy-hitter companion to the KMV
    distinct sketch, and like it fully deterministic (shared md5 hash
    family), so the oracle rebuilds identical counters.

    The 20-row heavy-hitter list is bounded plan-BUILD metadata, so it
    is collected once and probed as a literal frame (the prepared-
    statement pattern) — DataFrame lineage has no CTE materialization,
    and joining the counters against a live `top` subtree would
    re-tokenize the corpus three times per run instead of once."""
    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )
    from open_energy_data_server_spark.operators.textops import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    counters = cms_counters(toks, "tok", d=4, w=256)
    top_rows = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_count"))
        .orderBy(F.col("true_count").desc(), F.col("tok").asc())
        .limit(20)
        .collect()
    )
    top = local_df(
        spark,
        [(r["tok"], int(r["true_count"])) for r in top_rows],
        "tok string, true_count bigint",
    )
    est = cms_estimate(top.select("tok"), counters, "tok", d=4, w=256)
    return top.join(est, "tok").select("tok", "true_count", "cms_count")


@query(
    "q_grouping_sets",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders, {sql_dsum("o_totalprice")} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the two one-dimensional marginals plus the
    grand total in ONE pass (the dashboard-filter-panel shape: every
    dropdown's totals from a single scan). Spark expands the sets
    map-side and aggregates all three levels in one partial+final
    hash agg — one shuffle, no union of three scans."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"], []],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )


@query(
    "q_heatmap_dow_hour",
    oracle=f"""
    SELECT CAST(dayofweek(ts) AS INTEGER) AS dow,
           CAST(hour(ts) AS INTEGER) AS hod,
           COUNT(*) AS n, {{vsum}} AS value_sum
    FROM events GROUP BY 1, 2
    """.format(vsum=sql_dsum("value")),
)
def q_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day heatmap (the Grafana heatmap panel
    over any load/price series — weekly seasonality at a glance).
    Sunday = 0 on both engines (Spark's 1-based dayofweek shifted).
    One partial+final hash agg to ≤168 cells — map-side combine does
    all the reduction, scan-shaped at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("value_sum"))
    )


@query(
    "q_week_over_week",
    oracle=f"""
    WITH wk AS (
      SELECT strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS week,
             {{rev}} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT week, revenue,
           (revenue - LAG(revenue) OVER (ORDER BY week))
             / LAG(revenue) OVER (ORDER BY week) AS wow_change
    FROM wk
    """.format(rev=sql_dsum("o_totalprice")),
)
def q_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue change — the dashboard KPI column.
    Weekly totals are fixed-point sums; the change is two IEEE ops on
    deterministic values (NULL for the first week on both engines).
    The ordered LAG runs over the ALREADY-AGGREGATED |weeks| frame
    (bounded: one row per calendar week — the Benford post-agg
    single-partition precedent), never over raw orders."""
    o = load_table(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd").alias("week")
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.partitionBy(F.lit(1)).orderBy("week")
    prev = F.lag("revenue").over(w)
    return wk.select(
        "week", "revenue", ((F.col("revenue") - prev) / prev).alias("wow_change")
    )
