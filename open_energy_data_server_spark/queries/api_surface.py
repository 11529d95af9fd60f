"""API-surface conformance queries: the PostgREST param grammar and
the stored-procedure view (SURVEY §3.3, U4), plus the remaining
dashboard rawSql shapes (refit EXTRACT filter, gie distinct-subquery
join)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.plans.postgrest import translate
from open_energy_data_server_spark.plans.procedures import call_procedure, register_procedure
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    davg,
    sql_davg,
    sql_dsum,
    sql_ts_str,
    ts_str,
)


@query(
    "q_postgrest_filter_project",
    oracle=f"""
    SELECT event_id, {sql_ts_str("ts")} AS when_ts, value
    FROM events
    WHERE value >= 100 AND event_type = 'click'
    ORDER BY event_id
    LIMIT 50
    """,
)
def q_postgrest_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3: ``?value=gte.100&event_type=eq.click&select=event_id,
    ts:when_ts,value&order=event_id.asc&limit=50`` through the
    translator — filter+project+order+limit compile to one pruned
    scan (PushedFilters in the plan)."""
    ev = load_table(spark, sf_dir, "events")
    out = translate(
        ev,
        {
            "value": "gte.100",
            "event_type": "eq.click",
            "select": "event_id,ts:when_ts,value",
            "order": "event_id.asc",
            "limit": "50",
        },
    )
    return out.withColumn("when_ts", ts_str("when_ts"))


@query(
    "q_postgrest_aggregate",
    oracle="""
    SELECT event_type, COUNT(*) AS count, MAX(value) AS value_max, MIN(value) AS value_min
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def q_postgrest_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3 aggregate mode: ``select=event_type,count(),value.max(),
    value.min()`` → groupBy on the plain columns (the PostgREST
    ``power.sum()`` example, http_export_examples.md:17-22)."""
    ev = load_table(spark, sf_dir, "events")
    return translate(
        ev,
        {
            "value": "not.is.null",
            "select": "event_type,count(),value.max(),value.min()",
        },
    )


@query(
    "q_postgrest_in_like",
    oracle="""
    SELECT event_id, event_type, props
    FROM events
    WHERE CAST(event_type AS VARCHAR) IN ('click', 'view') AND props LIKE '%9}'
    ORDER BY event_id
    LIMIT 40
    """,
)
def q_postgrest_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3: ``in.(...)`` list filter + ``like.*pat`` wildcard."""
    ev = load_table(spark, sf_dir, "events")
    return translate(
        ev,
        {
            "event_type": "in.(click,view)",
            "props": "like.*9}",
            "select": "event_id,event_type,props",
            "order": "event_id.asc",
            "limit": "40",
        },
    )


@query(
    "q_postgrest_or_logic",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE (
        (CAST(event_type AS VARCHAR) = 'purchase' AND value >= 900)
        OR CAST(event_type AS VARCHAR) = 'signup'
    )
    AND NOT (user_id = 7)
    ORDER BY event_id
    LIMIT 60
    """,
)
def q_postgrest_or_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.3: PostgREST logic trees — ``or=(and(...),...)`` with one
    nesting level plus a negated comparator, the disjunctive-filter
    URLs PostgREST clients build (plans/postgrest.py _parse_logic).
    Compiles to one pushed-down conjunction over a single scan."""
    ev = load_table(spark, sf_dir, "events")
    return translate(
        ev,
        {
            "or": "(and(event_type.eq.purchase,value.gte.900),"
            "event_type.eq.signup)",
            "user_id": "not.eq.7",
            "select": "event_id,user_id,event_type,value",
            "order": "event_id.asc",
            "limit": "60",
        },
    )


register_procedure(
    "proc_revenue_year_region",
    f"""
    SELECT year(o_orderdate) AS year,
           r_name AS region,
           {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)


@query(
    "q_stored_procedure_view",
    oracle=f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
           r_name AS region,
           {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
)
def q_stored_procedure_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: the opsd stored procedure re-expressed as a registered SQL
    view (postgrest_stored_procedure.sql:12-31 — grouped totals per
    year/dimension), callable by name like ``/rpc/<name>``."""
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return call_procedure(spark, "proc_revenue_year_region")


@query(
    "q_extract_year_filter",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           {sql_davg("value")} AS avg_value
    FROM events
    WHERE EXTRACT(YEAR FROM ts) = 2024 AND EXTRACT(DOW FROM ts) NOT IN (0, 6)
    GROUP BY 1
    """,
)
def q_extract_year_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """refit.json:111 shape: time_bucket hourly avg with
    EXTRACT(YEAR)/weekday predicates (Spark dayofweek is 1=Sunday;
    DuckDB DOW is 0=Sunday — mapped accordingly)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.year("ts") == 2024) & (~F.dayofweek("ts").isin(1, 7))  # 1=Sun, 7=Sat
        )
        .groupBy(
            F.date_format(
                F.timestamp_seconds((F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("bigint")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("bucket")
        )
        .agg(davg("value").alias("avg_value"))
    )


@query(
    "q_join_distinct_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name, big.o_orderpriority
    FROM customer c
    JOIN (SELECT DISTINCT o_custkey, o_orderpriority FROM orders
          WHERE o_totalprice > 250000) big
      ON c.c_custkey = big.o_custkey
    """,
)
def q_join_distinct_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """gie.json shape (J5): join through a DISTINCT subquery
    (``location JOIN (SELECT DISTINCT parent, name FROM company)``)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        orders.filter(F.col("o_totalprice") > 250000)
        .select("o_custkey", "o_orderpriority")
        .distinct()
    )
    return customer.join(big, customer.c_custkey == big.o_custkey).select(
        "c_custkey", "c_name", "o_orderpriority"
    )


@query(
    "q_grafana_panel",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS time,
           event_type AS metric,
           {sql_davg("value")} AS avg_value
    FROM events
    WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-12 00:00:00'
    GROUP BY 1, 2
    """,
)
def q_grafana_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grafana dashboard rawSql, macros and all, executed verbatim
    through plans/grafana.expand_macros — the serving shape of every
    reference dashboard panel ($__timeFilter + $__timeGroupAlias +
    $__interval, e.g. /root/reference/data/provisioning/grafana/
    dashboards/refit.json:111). The engine expands the macros to its
    registered time_bucket SQL function and runs the text unchanged;
    only the time column is string-formatted on the aggregated rows
    for the hash gate."""
    from open_energy_data_server_spark.constants import SCALE
    from open_energy_data_server_spark.plans.grafana import expand_macros
    from open_energy_data_server_spark.session import register_engine_functions

    register_engine_functions(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    raw_sql = f"""
        SELECT $__timeGroupAlias(ts, $__interval),
               event_type AS metric,
               CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS DOUBLE)
                 / {SCALE}.0 / COUNT(value) AS avg_value
        FROM events
        WHERE $__timeFilter(ts)
        GROUP BY 1, 2
    """
    expanded = expand_macros(
        raw_sql, "2024-01-05 00:00:00", "2024-01-12 00:00:00", "1 hour"
    )
    df = spark.sql(expanded)
    return df.select(
        ts_str("time").alias("time"), "metric", "avg_value"
    )


@query(
    "q_keyset_pagination",
    oracle="""
    SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_date,
           o_totalprice
    FROM orders
    WHERE o_orderdate > TIMESTAMP '1996-06-01 00:00:00'
       OR (o_orderdate = TIMESTAMP '1996-06-01 00:00:00'
           AND o_orderkey > 1000)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20
    """,
)
def q_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination — the scalable successor to
    OFFSET paging for the PostgREST serving surface: resume strictly
    after the last (o_orderdate, o_orderkey) cursor with a tuple
    comparison, ORDER BY the same key, LIMIT the page. The filter
    pushes to the scan and the page is a TakeOrderedAndProject —
    page N costs the same as page 1 at any table size (OFFSET paging
    degrades linearly; serving.py clamps it for exactly this
    reason)."""
    o = load_table(spark, sf_dir, "orders")
    cur_d = F.lit("1996-06-01 00:00:00").cast("timestamp")
    after = (F.col("o_orderdate") > cur_d) | (
        (F.col("o_orderdate") == cur_d) & (F.col("o_orderkey") > 1000)
    )
    return (
        o.filter(after)
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_date"),
            "o_totalprice",
        )
    )
