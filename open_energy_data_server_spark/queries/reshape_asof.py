"""Reshape + as-of conformance queries (SURVEY §2.7 R1–R5, §2.4 J6,
§2.3 P16) — driving the operators in ``operators.reshape`` /
``operators.asof`` against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.asof import resample_calendar
from open_energy_data_server_spark.operators.reshape import melt, melt_by_suffix
from open_energy_data_server_spark.functions.timeutil import day_calendar
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)


@query(
    "q_melt_part_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS variable, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    """,
)
def q_melt_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: wide→long melt (``stack``) — zero-shuffle flatMap."""
    part = load_table(spark, sf_dir, "part")
    return melt(part, id_vars=["p_partkey"], value_vars=["p_size", "p_retailprice"])


@query(
    "q_melt_wide_chunked",
    oracle="""
    SELECT p_partkey, 'p_size' AS variable, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    UNION ALL SELECT p_partkey, 'size_x2', CAST(p_size * 2 AS DOUBLE) FROM part
    UNION ALL SELECT p_partkey, 'size_x3', CAST(p_size * 3 AS DOUBLE) FROM part
    UNION ALL SELECT p_partkey, 'size_x4', CAST(p_size * 4 AS DOUBLE) FROM part
    UNION ALL SELECT p_partkey, 'size_x5', CAST(p_size * 5 AS DOUBLE) FROM part
    """,
)
def q_melt_wide_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 at-width: chunked stack (chunk_size=2 → 3 unioned legs),
    the VEA 35k-column path in miniature
    (/root/reference/crawler/vea_industrial_load_profiles.py:109-127)."""
    part = load_table(spark, sf_dir, "part")
    wide = part.select(
        "p_partkey",
        "p_size",
        "p_retailprice",
        *[(F.col("p_size") * k).alias(f"size_x{k}") for k in range(2, 6)],
    )
    return melt(
        wide,
        id_vars=["p_partkey"],
        value_vars=["p_size", "p_retailprice", "size_x2", "size_x3", "size_x4", "size_x5"],
        chunk_size=2,
    )


@query(
    "q_suffix_melt",
    oracle=f"""
    SELECT l_linestatus, lower(l_returnflag) AS flag,
           {sql_dsum("l_quantity")} AS sum_qty,
           {sql_dsum("l_extendedprice")} AS sum_price
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def q_suffix_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: suffix-classified wide→long. Builds the regelleistung shape
    (``<area>_<measure>`` columns) via conditional aggregation, then
    routes the columns back to long form with melt_by_suffix — the
    round trip must equal a direct GROUP BY."""
    li = load_table(spark, sf_dir, "lineitem")
    flags = ["A", "N", "R"]
    aggs = []
    for f_ in flags:
        cond = F.col("l_returnflag") == f_
        aggs.append(dsum(F.when(cond, F.col("l_quantity"))).alias(f"{f_.lower()}_sum_qty"))
        aggs.append(
            dsum(F.when(cond, F.col("l_extendedprice"))).alias(f"{f_.lower()}_sum_price")
        )
    wide = li.groupBy("l_linestatus").agg(*aggs)
    return melt_by_suffix(
        wide,
        id_vars=["l_linestatus"],
        suffixes={"sum_qty": "sum_qty", "sum_price": "sum_price"},
        group_name="flag",
    )


@query(
    "q_pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS "view",
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error
    FROM events GROUP BY user_id
    """,
)
def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: long→wide pivot with a pinned key list (an unpinned pivot
    scans for distinct keys — unbounded schema at scale)."""
    ev = load_table(spark, sf_dir, "events")
    keys = ["click", "view", "purchase", "signup", "error"]
    pivoted = ev.groupBy("user_id").pivot("event_type", keys).count()
    return pivoted.select(
        "user_id", *[F.coalesce(F.col(k), F.lit(0)).alias(k) for k in keys]
    )


@query(
    "q_asof_rate_join",
    oracle=f"""
    WITH rates AS (
      SELECT CAST(ts AS DATE) AS day, {sql_davg("value")} AS rate
      FROM events
      WHERE event_type = 'view' AND day(CAST(ts AS DATE)) % 3 = 1
      GROUP BY 1
    ), purchases AS (
      SELECT event_id, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, strftime(p.day, '%Y-%m-%d') AS day, r.rate
    FROM purchases p ASOF LEFT JOIN rates r ON p.day >= r.day
    """,
)
def q_asof_rate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6/P16/W3: the OPEC FX-alignment idiom
    (``fx.reindex(prices.index).ffill()``,
    /root/reference/crawler/opec.py:82) — sparse daily rates are
    resampled onto a dense calendar with forward fill, then equi-
    joined to the event dates; DuckDB's native ASOF JOIN is the
    oracle. Calendar side is tiny → broadcast; the window fill runs
    over ≤31 rows (range-partition by month at 100 TB).
    """
    ev = load_table(spark, sf_dir, "events")
    rates = (
        ev.filter((F.col("event_type") == "view") & (F.dayofmonth(F.to_date("ts")) % 3 == 1))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(davg("value").alias("rate"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.to_date("ts").alias("day")
    )
    extent = ev.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    ).collect()[0]
    calendar = day_calendar(spark, str(extent.d0), str(extent.d1))
    dense = resample_calendar(rates, calendar, on="day", value_cols=["rate"], fill="ffill")
    return purchases.join(F.broadcast(dense), "day", "left").select(
        "event_id", F.date_format("day", "yyyy-MM-dd").alias("day"), "rate"
    )
