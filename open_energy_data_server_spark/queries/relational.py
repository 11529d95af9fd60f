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


@query(
    "q_snapshot_diff",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 11 <> 0
    ),
    n AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0
                  THEN o_totalprice + CAST(1.0 AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 13 <> 0
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           o.o_totalprice AS old_o_totalprice,
           n.o_totalprice AS new_o_totalprice,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_totalprice IS NOT DISTINCT FROM n.o_totalprice
                     THEN 'unchanged'
                ELSE 'changed' END AS change
    FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff between two snapshots of a keyed table
    (operators/snapshot.py snapshot_diff): every key classified
    added / removed / changed / unchanged via ONE co-partitionable
    full-outer join + a codegen classification — the "what did this
    load/compaction/backfill actually change" audit. Snapshots here
    are deterministic filters/mutations of orders so the oracle
    reconstructs both sides."""
    from open_energy_data_server_spark.operators.snapshot import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(1.0)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["o_totalprice"])


@query(
    "q_table_fingerprint",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(SUM(CAST('0x' || substr(md5(
                 COALESCE('v' || replace(replace(CAST(o_orderkey AS VARCHAR), '\\', '\\\\'), '|', '\\|'), 'n') || '|' ||
                 COALESCE('v' || replace(replace(CAST(o_custkey AS VARCHAR), '\\', '\\\\'), '|', '\\|'), 'n') || '|' ||
                 COALESCE('v' || replace(replace(o_orderstatus, '\\', '\\\\'), '|', '\\|'), 'n') || '|' ||
                 COALESCE('v' || replace(replace(o_orderpriority, '\\', '\\\\'), '|', '\\|'), 'n')), 1, 15) AS BIGINT)
               % 1000000007) AS BIGINT) AS fingerprint,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM orders GROUP BY 1
    """,
)
def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-partition content fingerprint
    (operators/snapshot.py table_fingerprint): rows hash to hash60 of
    a canonical '|'-joined string, reduced by a modular sum per year —
    two replicas agree iff their contents agree regardless of file
    layout or row order (the cross-replica integrity check after
    compaction / migration). One map-side-combined hash-agg; only
    integer/string columns enter the canonical form (double→string
    formatting is engine-specific)."""
    from open_energy_data_server_spark.operators.snapshot import table_fingerprint

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "yr", F.year("o_orderdate").cast("int")
    )
    return table_fingerprint(
        orders,
        ["yr"],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
    )
