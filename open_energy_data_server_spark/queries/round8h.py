"""Round-8 batch 7: the two classic relational shapes still missing
from the join/agg surface (202 queries total).

* cyclic join graph — TPC-H Q5's signature: the fact joins BOTH
  customer and supplier, constrained to the same nation
  (c_nationkey = s_nationkey), so the join graph has a CYCLE rather
  than a star chain (q_revenue_by_region is the linear chain). Cycles
  are where join ORDER matters most — the engine side pins the
  selective order and broadcasts every dimension;
* HAVING-feeds-semi-join — TPC-H Q18's signature: an aggregate with a
  HAVING threshold producing a key set that re-joins the facts (the
  'large orders and who placed them' report). Exercises the
  aggregate→semi-join pipeline none of the other 200 queries compose.

House discipline: exact scaled-BIGINT money sums, deterministic
orderings, oracles in the natural SQL formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import sql_fmt_dbl

# ---------------------------------------------------------------------------
# q_local_supplier_volume — the Q5 cyclic join

_LSV = (
    f"CAST(ROUND(l_extendedprice * (1 - l_discount) * {SCALE}, 0) AS BIGINT)"
)


@query(
    "q_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           {sql_fmt_dbl(
               f"CAST(SUM({_LSV}) AS DOUBLE) / {SCALE}.0"
           )} AS local_revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE s.s_nationkey = c.c_nationkey
    GROUP BY 1
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier volume (the TPC-H Q5 shape): revenue from
    lineitems whose supplier sits in the SAME nation as the ordering
    customer — the join graph is a CYCLE (fact → orders → customer,
    fact → supplier, customer.nation = supplier.nation), not a star
    chain, which is exactly where Catalyst's join reordering earns its
    keep. Plan: the one fact⋈fact equi-join (lineitem⋈orders) shuffles
    on orderkey; customer/supplier/nation broadcast, and the nation
    equality closes the cycle as a post-join filter that AQE pushes
    into the broadcast probes. Revenue is the discounted extended
    price as an exact scaled-BIGINT sum."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sv = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SCALE, 0
    ).cast("bigint")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .where(supplier.s_nationkey == customer.c_nationkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        F.round(
            F.sum(sv).cast("double") / F.lit(float(SCALE)), 6
        ).alias("local_revenue"),
    )


# ---------------------------------------------------------------------------
# q_large_orders — the Q18 HAVING-feeds-semi-join

_LO_QTY = 200


@query(
    "q_large_orders",
    oracle=f"""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem GROUP BY 1
      HAVING SUM(CAST(l_quantity AS BIGINT)) > {_LO_QTY}
    )
    SELECT c.c_name AS customer,
           o.o_orderkey AS orderkey,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
           {sql_fmt_dbl(
               f"CAST(SUM(CAST(ROUND(l.l_quantity * {SCALE}, 0) AS BIGINT))"
               f" AS DOUBLE) / {SCALE}.0"
           )} AS total_qty
    FROM orders o
    JOIN big    ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1, 2, 3
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-order report (the TPC-H Q18 shape): orders whose total
    quantity exceeds {_LO_QTY}, re-joined to customers and lineitems —
    the aggregate-with-HAVING producing a KEY SET that semi-joins back
    into the facts. Plan: the HAVING rollup is one hash-agg on
    orderkey; its (small, selective) output joins orders and re-joins
    lineitem on the SAME orderkey partitioning, so the three
    orderkey-keyed exchanges reuse; customer broadcasts. Quantities
    are integral, summed as scaled BIGINTs for the output column."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .where(F.col("qty") > _LO_QTY)
        # rename: `big` re-joins its own lineage (li) below, and the
        # analyzer rejects the ambiguous l_orderkey otherwise
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    joined = (
        orders.join(big, orders.o_orderkey == big.big_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
    )
    return joined.groupBy(
        F.col("c_name").alias("customer"),
        F.col("o_orderkey").alias("orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    ).agg(
        F.round(
            F.sum(F.round(F.col("l_quantity") * SCALE, 0).cast("bigint"))
            .cast("double")
            / F.lit(float(SCALE)),
            6,
        ).alias("total_qty")
    )
