"""Join conformance queries (SURVEY §2.4, J1–J8).

Models: SQL equi-joins of the dashboard layer (J5, gie.json /
open_nrw.json rawSql), broadcast dimension joins (J3,
/root/reference/crawler/nuts_mapper.py:70), multi-way full-outer
merges (J2, /root/reference/crawler/regelleistung.py:305-307),
neighbour-pair explosion (J7,
/root/reference/crawler/entsoe_crawler.py:41-47), incremental
anti-join/watermark semantics (J8,
/root/reference/crawler/smard.py:121-122).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table, local_df
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import dsum, sql_dsum, sql_ts_str, ts_str


@query(
    "q_revenue_by_region",
    oracle=f"""
    SELECT r.r_name AS region,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5+J3: star-schema join chain with broadcast dimensions.

    customer/nation/region are small dims → explicit ``broadcast``
    keeps the big fact tables shuffle-free on their side of the join
    (only lineitem⋈orders shuffles; at 100 TB both facts would be
    bucketed on orderkey to kill that exchange too).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(region.r_name.alias("region"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_shipping_priority_top10",
    oracle=f"""
    SELECT l.l_orderkey AS orderkey,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
           {sql_ts_str("o.o_orderdate")} AS orderdate,
           o.o_orderpriority AS priority
    FROM customer c
    JOIN orders o  ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def q_shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped join + agg + deterministic top-k (W6 limit)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("2000-03-15 00:00:00").cast("timestamp"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1996-03-15 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "revenue",
            ts_str("o_orderdate").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.col("revenue").desc(), "orderkey")
        .limit(10)
    )


@query(
    "q_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "q_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: left-anti join (NOT EXISTS) — the incremental-load dedup shape."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q_incremental_since_watermark",
    oracle=f"""
    SELECT event_id, user_id, event_type, {sql_ts_str("ts")} AS ts
    FROM events
    WHERE ts > (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
    """,
)
def q_incremental_since_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8/T1: keep only rows newer than the stored watermark.

    The watermark is a one-row broadcast (scalar subquery) — Catalyst
    plans it as a broadcast nested-loop over a single row, so the fact
    scan stays a single pass with the predicate applied streamside.
    """
    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("wm"))
    return (
        ev.join(F.broadcast(wm))
        .filter(F.col("ts") > F.col("wm"))
        .select("event_id", "user_id", "event_type", ts_str("ts").alias("ts"))
    )


@query(
    "q_multiway_full_outer",
    oracle="""
    WITH clicks AS (
      SELECT user_id, COUNT(*) AS n_click FROM events
      WHERE event_type = 'click' AND value > 400 GROUP BY user_id
    ), purchases AS (
      SELECT user_id, COUNT(*) AS n_purchase FROM events
      WHERE event_type = 'purchase' AND value > 450 GROUP BY user_id
    ), errors AS (
      SELECT user_id, COUNT(*) AS n_error FROM events
      WHERE event_type = 'error' AND value > 480 GROUP BY user_id
    )
    SELECT COALESCE(c.user_id, p.user_id, e.user_id) AS user_id,
           COALESCE(n_click, 0) AS n_click,
           COALESCE(n_purchase, 0) AS n_purchase,
           COALESCE(n_error, 0) AS n_error
    FROM clicks c
    FULL OUTER JOIN purchases p ON c.user_id = p.user_id
    FULL OUTER JOIN errors e ON COALESCE(c.user_id, p.user_id) = e.user_id
    """,
)
def q_multiway_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: reduce-style multi-way full-outer merge on a shared key.

    The reference folds 3–8 melted frames with
    ``functools.reduce(lambda l, r: l.join(r, how="outer"))``
    (/root/reference/crawler/regelleistung.py:305-307). Same shape
    here; each leg is already aggregated (small) so AQE converts the
    outer joins to broadcasts.
    """
    ev = load_table(spark, sf_dir, "events")

    def leg(etype: str, thresh: float, out: str) -> DataFrame:
        return (
            ev.filter((F.col("event_type") == etype) & (F.col("value") > thresh))
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias(out))
        )

    clicks = leg("click", 400, "n_click")
    purchases = leg("purchase", 450, "n_purchase")
    errors = leg("error", 480, "n_error")

    j1 = clicks.join(purchases, "user_id", "full_outer")  # USING key coalesces
    out = j1.join(errors, "user_id", "full_outer")
    return out.select(
        "user_id",
        F.coalesce("n_click", F.lit(0)).alias("n_click"),
        F.coalesce("n_purchase", F.lit(0)).alias("n_purchase"),
        F.coalesce("n_error", F.lit(0)).alias("n_error"),
    )


@query(
    "q_neighbour_pairs",
    oracle="""
    SELECT t.src, t.dst,
           n1.n_nationkey AS src_key, n2.n_nationkey AS dst_key
    FROM (VALUES ('NATION_0','NATION_1'), ('NATION_0','NATION_2'),
                 ('NATION_1','NATION_3'), ('NATION_2','NATION_3'),
                 ('NATION_3','NATION_24')) AS t(src, dst)
    JOIN nation n1 ON n1.n_name = t.src
    JOIN nation n2 ON n2.n_name = t.dst
    """,
)
def q_neighbour_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: loops-become-data — explode a neighbour map to a pair table,
    then resolve each side against the dimension
    (/root/reference/crawler/entsoe_crawler.py:41-47,359-369)."""
    nation = load_table(spark, sf_dir, "nation")
    pairs = [
        ("NATION_0", "NATION_1"),
        ("NATION_0", "NATION_2"),
        ("NATION_1", "NATION_3"),
        ("NATION_2", "NATION_3"),
        ("NATION_3", "NATION_24"),
    ]
    pairs_df = local_df(spark, pairs, "src string, dst string")
    n1 = nation.select(F.col("n_name").alias("src"), F.col("n_nationkey").alias("src_key"))
    n2 = nation.select(F.col("n_name").alias("dst"), F.col("n_nationkey").alias("dst_key"))
    return (
        pairs_df.join(F.broadcast(n1), "src")
        .join(F.broadcast(n2), "dst")
        .select("src", "dst", "src_key", "dst_key")
    )


@query(
    "q_union_distinct",
    oracle="""
    SELECT o_orderpriority AS priority, o_orderstatus AS status
    FROM orders WHERE o_totalprice > 150000
    UNION
    SELECT o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: SQL UNION (distinct) of two branches — jao.json uses
    ``UNION`` (not ALL), so the dedup is part of the semantics."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_orderpriority").alias("priority"), F.col("o_orderstatus").alias("status")
    )
    b = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")).select(
        F.col("o_orderpriority").alias("priority"), F.col("o_orderstatus").alias("status")
    )
    return a.union(b).distinct()


@query(
    "q_range_join_fiscal_windows",
    oracle=f"""
    WITH q AS (
      SELECT DISTINCT date_trunc('quarter', o_orderdate) AS qstart FROM orders
    ),
    iv AS (
      SELECT strftime(qstart, '%Y-%m-%d') AS window_start,
             epoch_us(qstart) // 1000000 - 1296000 AS lo,
             epoch_us(qstart) // 1000000 + 9072000 AS hi
      FROM q
    ),
    p AS (
      SELECT epoch_us(l_shipdate) // 1000000 AS p, l_extendedprice FROM lineitem
    )
    SELECT window_start, COUNT(*) AS n, {sql_dsum("l_extendedprice")} AS revenue
    FROM iv JOIN p ON p.p >= iv.lo AND p.p < iv.hi
    GROUP BY window_start
    """,
)
def q_range_join_fiscal_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General range join (no equality key): overlapping 120-day
    fiscal windows (quarter start − 15 d, + 105 d) × lineitem
    shipdates. The oracle replays the theta-join DEFINITION; the
    engine runs operators.range_join_bucketed — interval rows explode
    into 30-day buckets, points equi-join on their single bucket, the
    exact predicate filters residually. Linear shuffle, no nested
    loop."""
    from open_energy_data_server_spark.operators.range_join import range_join_bucketed

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    iv = (
        orders.select(F.date_trunc("quarter", "o_orderdate").alias("qstart"))
        .distinct()
        .select(
            F.date_format("qstart", "yyyy-MM-dd").alias("window_start"),
            (F.unix_timestamp(F.col("qstart").cast("timestamp")) - 1_296_000).alias("lo"),
            (F.unix_timestamp(F.col("qstart").cast("timestamp")) + 9_072_000).alias("hi"),
        )
    )
    p = li.select(
        F.unix_timestamp(F.col("l_shipdate").cast("timestamp")).alias("p"),
        "l_extendedprice",
    )
    j = range_join_bucketed(p, iv, "p", "lo", "hi", bucket=30 * 86400)
    return j.groupBy("window_start").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_extendedprice").alias("revenue")
    )


@query(
    "q_intersect_except",
    oracle="""
    WITH buyers AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    ),
    urgent AS (
      SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT 'both' AS grp, custkey FROM (SELECT custkey FROM buyers INTERSECT SELECT custkey FROM urgent)
    UNION ALL
    SELECT 'big_only', custkey FROM (SELECT custkey FROM buyers EXCEPT SELECT custkey FROM urgent)
    """,
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT) — the SQL surface's
    remaining set algebra beyond UNION. Both compile to hash
    left-semi/anti joins over the deduped inputs: one shuffle each on
    the set key, no sort."""
    orders = load_table(spark, sf_dir, "orders")
    buyers = (
        orders.filter(F.col("o_totalprice") > 150000)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    both = buyers.intersect(urgent).select(F.lit("both").alias("grp"), "custkey")
    big_only = buyers.exceptAll(urgent).select(
        F.lit("big_only").alias("grp"), "custkey"
    )
    return both.unionByName(big_only)
