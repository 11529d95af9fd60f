"""Round-9 batch 2: the remaining classic relational plan shapes.

Each query exercises a join/subquery STRUCTURE none of the other
registered queries compose (the TPC-H number names the shape, the
semantics are adapted to the driver's columns):

* Q17 — correlated scalar-aggregate subquery (per-key average feeding
  the outer filter) → decorrelated into agg + join-back;
* Q21 — EXISTS + NOT EXISTS against the SAME fact with different
  correlations (multi-supplier orders where one supplier shipped
  last) → semi-join + anti-join stack on one scan;
* Q13 — count distribution off a FILTERED left outer join (customers
  with zero orders must appear) → two-level aggregation;
* Q15 — aggregate view joined back on equality with its own MAX
  (ties kept) → scalar subquery over an agg;
* Q22 — anti-join under an uncorrelated scalar-subquery threshold.

House discipline: exact scaled-BIGINT money sums, deterministic
orderings, oracles in the natural correlated-SQL formulation so the
DuckDB side actually goes through subquery decorrelation too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import sql_fmt_dbl

# ---------------------------------------------------------------------------
# q_small_quantity_revenue — the Q17 correlated scalar-aggregate subquery

_SQR_PRICE = f"CAST(ROUND(l_extendedprice * {SCALE}, 0) AS BIGINT)"


@query(
    "q_small_quantity_revenue",
    oracle=f"""
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           {sql_fmt_dbl(f"CAST(SUM({_SQR_PRICE}) AS DOUBLE) / {SCALE}.0 / 7.0")}
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
    GROUP BY 1
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue (the TPC-H Q17 shape): lineitems whose
    quantity is under 20 % of their part's average quantity — the
    CORRELATED scalar-aggregate subquery, decorrelated the way an
    optimizer must: ONE per-part average aggregation (map-side
    combined on partkey) joined back to the fact, never a re-scan per
    outer row. Plan: lineitem is scanned twice (avg leg + fact leg)
    but shuffles once per leg on partkey, exchanges reuse; the
    filtered part dimension broadcasts. Revenue is an exact
    scaled-BIGINT sum over the surviving rows, scaled to the
    conventional /7 yearly figure."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    price = F.round(F.col("l_extendedprice") * SCALE, 0).cast("bigint")
    small = (
        li.join(avg_qty, li.l_partkey == avg_qty.ap)
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .join(
            F.broadcast(part.where(F.col("p_size") <= 10)),
            li.l_partkey == F.col("p_partkey"),
        )
    )
    return small.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_small"),
        F.round(
            F.sum(price).cast("double") / F.lit(float(SCALE)) / 7.0, 6
        ).alias("avg_yearly"),
    )


# ---------------------------------------------------------------------------
# q_last_shipper — the Q21 EXISTS + NOT EXISTS stack


@query(
    "q_last_shipper",
    oracle="""
    SELECT s.s_name AS supplier,
           CAST(COUNT(*) AS BIGINT) AS n_orders_held_up
    FROM lineitem l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY 1
    ORDER BY 2 DESC, 1
    LIMIT 20
    """,
)
def q_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hold-up report (the TPC-H Q21 shape): for multi-supplier
    orders, which supplier shipped LAST (no later shipment exists) —
    an EXISTS and a NOT EXISTS against the same fact with different
    correlations. Decorrelated as Q21 demands: both subqueries become
    per-orderkey aggregates over ONE extra scan (count of distinct
    suppliers; max shipdate), broadcast-free, joined back on the
    orderkey partitioning the fact already has — the anti-join is the
    `l_shipdate = max` equality (a row with a later shipment fails
    it), the semi-join is `n_supps > 1`. Note rows TIED at the max
    shipdate all qualify, exactly like the NOT EXISTS. Top-20 by
    held-up orders, deterministic tiebreak."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.max("l_shipdate").alias("max_ship"),
    )
    held = (
        li.join(per_order, li.l_orderkey == per_order.ok)
        .where((F.col("n_supps") > 1) & (F.col("l_shipdate") == F.col("max_ship")))
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
    )
    return (
        held.groupBy(F.col("s_name").alias("supplier"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders_held_up"))
        .orderBy(F.col("n_orders_held_up").desc(), "supplier")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q_order_count_distribution — the Q13 filtered-left-join histogram


@query(
    "q_order_count_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per_cust
    GROUP BY 1
    """,
)
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count distribution (the TPC-H Q13 shape): how many
    customers placed 0, 1, 2, … non-urgent orders — the FILTERED left
    outer join (the filter lives in the JOIN CONDITION, not a WHERE,
    so zero-order customers survive) feeding a two-level aggregation.
    Plan: one custkey shuffle for the outer join + first-level count,
    then a map-side-combined rollup on the (tiny-domain) count."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = customer.join(
        orders,
        (customer.c_custkey == orders.o_custkey)
        & (orders.o_orderpriority != "1-URGENT"),
        "left",
    ).groupBy("c_custkey").agg(
        F.count("o_orderkey").cast("bigint").alias("n_orders")
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


# ---------------------------------------------------------------------------
# q_top_revenue_suppliers — the Q15 max-equality-over-view shape

_TRS_REV = (
    f"CAST(ROUND(l_extendedprice * (1 - l_discount) * {SCALE}, 0) AS BIGINT)"
)


@query(
    "q_top_revenue_suppliers",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM({_TRS_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01'
        AND l_shipdate <  DATE '1995-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supplier,
           {sql_fmt_dbl(f"CAST(r.total_rev AS DOUBLE) / {SCALE}.0")}
             AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q_top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-revenue supplier (the TPC-H Q15 shape): an aggregate VIEW
    (quarterly revenue per supplier) filtered by equality with its own
    MAX — the scalar-subquery-over-aggregate structure; suppliers TIED
    at the max all return (which is why this is not a LIMIT 1). Plan:
    one suppkey hash-agg; the scalar max is a 1-row broadcast back
    over the SAME aggregate (Spark reuses the exchange), supplier
    broadcasts. Exact scaled-BIGINT revenue so the max-equality is
    never a float comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * SCALE, 0
    ).cast("bigint")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("date"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).alias("total_rev"))
    )
    best = revenue.agg(F.max("total_rev").alias("best_rev"))
    return (
        revenue.join(F.broadcast(best), F.col("total_rev") == F.col("best_rev"))
        .join(F.broadcast(supplier), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier"),
            F.round(
                F.col("total_rev").cast("double") / F.lit(float(SCALE)), 6
            ).alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q_idle_rich_customers — the Q22 anti-join under a scalar threshold


@query(
    "q_idle_rich_customers",
    oracle=f"""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_fmt_dbl(
               f"CAST(SUM(CAST(ROUND(c.c_acctbal * {SCALE}, 0) AS BIGINT))"
               f" AS DOUBLE) / {SCALE}.0"
           )} AS total_acctbal
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY 1
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idle-rich report (the TPC-H Q22 shape): customers with an
    above-average positive balance who never ordered — an
    UNCORRELATED scalar subquery (the global average) gating an
    anti-join, rolled up per segment. Plan: the scalar average is a
    1-row broadcast over a second customer scan; the anti-join
    shuffles (custkey, acctbal) against the orders key set — at scale
    the orders side prunes to the distinct-key projection before the
    exchange. Balances sum as exact scaled BIGINTs."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = customer.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("bal_cut")
    )
    bal = F.round(F.col("c_acctbal") * SCALE, 0).cast("bigint")
    rich = customer.join(
        F.broadcast(avg_bal), F.col("c_acctbal") > F.col("bal_cut")
    )
    idle = rich.join(
        orders.select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(
            F.sum(bal).cast("double") / F.lit(float(SCALE)), 6
        ).alias("total_acctbal"),
    )
