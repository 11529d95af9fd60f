"""Core relational conformance queries (SURVEY §2.3–§2.7).

Each query models a concrete reference behavior (cited) but runs on
the driver's TPC-H-ish testdata. All aggregates use exact decimal
accumulation (see _util) so results hash-match DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      {sum_qty} AS sum_qty,
      {sum_base} AS sum_base_price,
      {sum_disc} AS sum_disc_price,
      {sum_charge} AS sum_charge,
      {avg_qty} AS avg_qty,
      {avg_price} AS avg_price,
      {avg_disc} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """.format(
        sum_qty=sql_dsum("l_quantity"),
        sum_base=sql_dsum("l_extendedprice"),
        sum_disc=sql_dsum("l_extendedprice * (1 - l_discount)"),
        sum_charge=sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)"),
        avg_qty=sql_davg("l_quantity"),
        avg_price=sql_davg("l_extendedprice"),
        avg_disc=sql_davg("l_discount"),
    ),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped multi-measure aggregation.

    Models the reference's 15-column multi-avg dashboard panel (A3,
    /root/reference/data/provisioning/grafana/dashboards/entsoe.json:1248)
    — a single wide hash aggregate, partial+final via Catalyst; no
    extra shuffle beyond the one groupBy exchange.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
