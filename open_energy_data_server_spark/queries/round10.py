"""Round-10: the remaining TPC-H query shapes — with these thirteen,
every one of the 22 TPC-H plan structures has a registered,
oracle-verified equivalent (Q1/Q3/Q5/Q13/Q15/Q17/Q18/Q21/Q22 landed
in earlier rounds). The testdata carries no partsupp table and no
commitdate/shipmode/container columns, so Q2/Q9/Q11/Q16/Q20 are
*adapted* shapes: identical join/subquery STRUCTURE (that is what an
optimizer sees), semantics re-expressed over the columns that exist.

House discipline: exact scaled-BIGINT money sums (queries/_util),
identical aliases both sides, deterministic total orders on every
LIMIT, oracles written in the natural correlated/nested-SQL
formulation so DuckDB's optimizer does the same decorrelation work
Catalyst does.

Reference parity: the reference serves ad-hoc analytical SQL over
TimescaleDB (SURVEY §2 U4/J5); these pin the relational surface a
warehouse user would actually throw at it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    dsum,
    sql_dsum,
    sql_fmt_dbl,
)

_VOL = "l_extendedprice * (1 - l_discount)"


def _volume() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# q_min_cost_supplier — the Q2 correlated-MIN shape (adapted: unit cost
# observed from lineitem instead of partsupp.ps_supplycost)


@query(
    "q_min_cost_supplier",
    oracle="""
    SELECT s.s_name AS supplier, n.n_name AS nation,
           p.p_partkey AS partkey,
           ROUND(MIN(ROUND(l.l_extendedprice / l.l_quantity, 6)), 6)
             AS unit_cost
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
    GROUP BY 1, 2, 3
    HAVING MIN(ROUND(l.l_extendedprice / l.l_quantity, 6)) = (
        SELECT MIN(ROUND(l2.l_extendedprice / l2.l_quantity, 6))
        FROM lineitem l2
        JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
      )
    ORDER BY unit_cost, partkey, supplier
    LIMIT 50
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier per part (the TPC-H Q2 shape): the
    correlated MIN subquery — which supplier offers each size-15 part
    at that part's REGIONAL minimum unit price. Decorrelated the only
    way that scales: ONE per-(part, supplier) MIN aggregation, a
    per-part MIN over it (two map-side-combinable aggs, no re-scan
    per outer row), equality join-back keeping ties. Dims (supplier,
    nation, region) broadcast; MIN of per-row ROUND(·, 6) is
    order-independent, so the equality predicate is engine-stable
    where AVG-based cost would differ in the last ulp."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    eu_supp = (
        supp.join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg.where(F.col("r_name") == "EUROPE")),
                    nat.n_regionkey == reg.r_regionkey,
                )
            ),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    unit = F.round(F.col("l_extendedprice") / F.col("l_quantity"), 6)
    per_ps = (
        li.join(F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "s_name", "n_name")
        .agg(F.min(unit).alias("unit_cost"))
    )
    part_min = per_ps.groupBy(F.col("l_partkey").alias("mp")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        per_ps.join(
            part_min,
            (per_ps.l_partkey == part_min.mp)
            & (per_ps.unit_cost == part_min.min_cost),
        )
        .join(
            F.broadcast(part.where(F.col("p_size") == 15)),
            per_ps.l_partkey == F.col("p_partkey"),
        )
        .select(
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy("unit_cost", "partkey", "supplier")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q_order_priority_check — the Q4 EXISTS shape


@query(
    "q_order_priority_check",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 45 DAY
      )
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (the TPC-H Q4 shape): count orders in a
    quarter having at least one lineitem shipped more than 45 days
    after the order — a correlated EXISTS whose predicate references
    BOTH sides (l_shipdate > o_orderdate + 45d). Decorrelates to one
    LEFT SEMI join with the compound condition; the quarter filter
    prunes the orders scan before the shuffle; no pair explosion
    (semi joins short-circuit on first match)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    hit = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 45 DAYS")),
        "left_semi",
    )
    return (
        hit.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# q_forecast_revenue_delta — the Q6 pure-pushdown shape


@query(
    "q_forecast_revenue_delta",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue_delta,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue change (the TPC-H Q6 shape): the canonical
    filter-everything-then-one-sum query. Every predicate reaches the
    parquet scan (shipdate range + discount band + quantity are all
    PushedFilters; row groups outside the year are skipped on
    statistics), the sum is a single map-side-combined global agg —
    zero shuffle beyond the final 1-row reduce. At 100 TB this is
    pure scan bandwidth."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias(
            "revenue_delta"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q_volume_shipping — the Q7 two-nation shape


@query(
    "q_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
             {_VOL} AS volume
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two trading nations (the TPC-H Q7
    shape): the same dimension table (nation) joined TWICE under
    different roles with a cross-role disjunction. Both nation legs
    broadcast (25 rows); the disjunctive pair filter applies after
    the second broadcast join, before the year rollup — the fact
    shuffles once, on the agg keys."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    n1 = nat.select(
        F.col("n_nationkey").alias("nk1"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("nk2"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("nk1"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("nk2"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(_volume()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# q_market_share — the Q8 conditional-ratio shape


_Q8_GATED = "CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END"


@query(
    "q_market_share",
    oracle=f"""
    SELECT o_year,
           {sql_fmt_dbl(
               f"({sql_dsum(_Q8_GATED)}) / ({sql_dsum('volume')})"
           )} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             {_VOL} AS volume,
             n1.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share inside a region (the TPC-H Q8 shape):
    ratio of a CASE-gated sum to the plain sum per year — the
    conditional-aggregate ratio no join reorder can break. The
    customer-side nation→region restriction prunes rows; the
    supplier-side nation is kept as a grouping input only inside the
    CASE. All dims broadcast; both sums are exact fixed-point and the
    final ratio is one deterministic double divide."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    n_cust = nat.join(
        F.broadcast(reg.where(F.col("r_name") == "EUROPE")),
        nat.n_regionkey == reg.r_regionkey,
    ).select(F.col("n_nationkey").alias("nk_c"))
    n_supp = nat.select(
        F.col("n_nationkey").alias("nk_s"), F.col("n_name").alias("supp_nation")
    )
    j = (
        li.join(
            F.broadcast(p.where(F.col("p_type") == "ECONOMY")),
            li.l_partkey == p.p_partkey,
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("nk_c"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("nk_s"))
    )
    vol = _volume()
    gated = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        j.groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(dsum(gated) / dsum(vol), 6).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# q_product_profit — the Q9 profit shape (adapted: cost proxy from
# part.p_retailprice instead of partsupp.ps_supplycost)


@query(
    "q_product_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum("amount")} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (the TPC-H Q9 shape): five-way star join
    with a LIKE-filtered part leg and a per-row arithmetic amount
    (revenue minus a cost term — the partsupp.ps_supplycost leg is
    proxied by 0.6 × p_retailprice since the testdata has no
    partsupp). The LIKE filter shrinks part before broadcast;
    supplier/nation broadcast; the fact shuffles once on the
    (nation, year) rollup keys. Amounts can be negative — the
    fixed-point sum is sign-exact either way."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    j = (
        li.join(
            F.broadcast(p.where(F.col("p_name").like("%gear%"))),
            li.l_partkey == p.p_partkey,
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
    )
    amount = _volume() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# q_returned_items — the Q10 shape


@query(
    "q_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS custkey, c.c_name AS customer,
           n.n_name AS nation,
           {sql_dsum(_VOL)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (the TPC-H Q10 shape): lost revenue per
    customer from returned lines in a half-year window, top 20. The
    returnflag filter pushes into the lineitem scan, the date filter
    into orders; nation broadcasts; the deterministic (revenue DESC,
    custkey) order makes the LIMIT total — TakeOrderedAndProject, no
    global sort materialization."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag") == "R"
    )
    nat = load_table(spark, sf_dir, "nation")
    j = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nat), c.c_nationkey == nat.n_nationkey)
    )
    return (
        j.groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("customer"),
            F.col("n_name").alias("nation"),
        )
        .agg(dsum(_volume()).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q_important_volume_parts — the Q11 HAVING-scalar shape (adapted:
# per-part shipped value from one nation's suppliers vs a global cut)


@query(
    "q_important_volume_parts",
    oracle=f"""
    SELECT l.l_partkey AS partkey,
           {sql_dsum("l.l_extendedprice")} AS value
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
    GROUP BY 1
    HAVING SUM(CAST(ROUND(l.l_extendedprice * 1000000, 0) AS BIGINT)) > (
        SELECT 1.5 * CAST(SUM(CAST(ROUND(l2.l_extendedprice * 1000000, 0)
                                   AS BIGINT)) AS DOUBLE)
               / COUNT(DISTINCT l2.l_partkey)
        FROM lineitem l2
        JOIN supplier s2 ON l2.l_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        WHERE n2.n_name = 'NATION_3'
      )
    ORDER BY value DESC, partkey
    """,
)
def q_important_volume_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (the TPC-H Q11 shape): per-part
    value restricted to one nation's suppliers, kept only where it
    exceeds 1.5× THE AVERAGE PART'S VALUE — an uncorrelated scalar
    subquery in HAVING (the TPC-H constant fraction is scale-DEPENDENT
    and selects nothing past its calibration SF; average-relative is
    the same plan shape at every scale). The scalar leg reuses the
    same filtered agg (one extra reduce to a single row, broadcast
    back); no per-group re-scan. The cut comparison runs on the
    scaled-BIGINT sums themselves — the per-group side stays exact, so
    > is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    nation_supp = s.join(
        F.broadcast(nat.where(F.col("n_name") == "NATION_3")),
        s.s_nationkey == nat.n_nationkey,
    ).select("s_suppkey")
    filtered = li.join(
        F.broadcast(nation_supp), li.l_suppkey == F.col("s_suppkey")
    )
    scaled = F.round(F.col("l_extendedprice") * 1_000_000, 0).cast("bigint")
    per_part = filtered.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(scaled).alias("value_sc")
    )
    total = per_part.agg(
        (
            1.5 * F.sum("value_sc").cast("double") / F.count(F.lit(1))
        ).alias("cut_sc")
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value_sc").cast("double") > F.col("cut_sc"))
        .select(
            "partkey",
            (F.col("value_sc").cast("double") / 1_000_000.0).alias("value"),
        )
        .orderBy(F.col("value").desc(), F.col("partkey"))
    )


# ---------------------------------------------------------------------------
# q_late_priority_lines — the Q12 two-CASE shape (adapted: lateness
# from shipdate - orderdate instead of the absent ship/commit dates)


@query(
    "q_late_priority_lines",
    oracle="""
    SELECT l.l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-delay priority split (the TPC-H Q12 shape): lines
    shipped >30 days after their order, split into high/low priority
    counts via two complementary CASE aggregates in ONE pass — the
    canonical pivot-in-agg. The year filter pushes into the scan; the
    cross-table lateness predicate rides the join condition."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    j = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("linestatus")
    )


# ---------------------------------------------------------------------------
# q_promo_revenue_share — the Q14 single-row ratio shape


_Q14_GATED = f"CASE WHEN p.p_type = 'PROMO' THEN {_VOL} ELSE 0 END"


@query(
    "q_promo_revenue_share",
    oracle=f"""
    SELECT {sql_fmt_dbl(
        f"100.0 * ({sql_dsum(_Q14_GATED)}) / ({sql_dsum(_VOL)})"
    )} AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-revenue percentage (the TPC-H Q14 shape): one month
    of lineitems, percent of revenue from PROMO parts — a global
    CASE-gated ratio reduced to a single row. Part broadcasts; the
    month filter is a scan-level row-group pruner; both sums are
    fixed-point exact so the percentage matches DuckDB bit-for-bit
    after the shared ROUND."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    vol = _volume()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return j.agg(
        F.round(100.0 * dsum(promo) / dsum(vol), 6).alias("promo_revenue_pct")
    )


# ---------------------------------------------------------------------------
# q_supplier_count_by_part — the Q16 NOT-IN + COUNT DISTINCT shape


@query(
    "q_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand AS brand, p.p_size AS size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_type <> 'PROMO'
      AND p.p_size IN (1, 14, 23, 45, 49)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, brand, size
    """,
)
def q_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier diversity per part class (the TPC-H Q16 shape): COUNT
    DISTINCT suppliers per (brand, size) over an IN-list-filtered
    part leg, EXCLUDING a NOT IN subquery of deadbeat suppliers.
    NOT IN over a non-nullable key decorrelates to a broadcast ANTI
    join (the null-aware trap doesn't arise: s_suppkey is a PK); the
    distinct-count shuffles on the group keys with partial distinct
    aggregation map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 14, 23, 45, 49)
    )
    bad = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_size").alias("size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "size")
    )


# ---------------------------------------------------------------------------
# q_bracketed_revenue — the Q19 disjunctive-brackets shape


@query(
    "q_bracketed_revenue",
    oracle=f"""
    SELECT {sql_dsum(_VOL)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue under disjunctive brackets (the TPC-H Q19
    shape): three AND-groups OR-ed together, each mixing part-side and
    lineitem-side predicates. The optimizer must push the COMMON
    derivable predicates through the join (brand ∈ {11,22,33},
    size ≤ 15 prune part pre-broadcast; quantity ≤ 30 prunes the fact
    scan) while keeping the residual disjunction as a post-join
    filter — the classic CNF-extraction test."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    br = F.col("p_brand")
    brackets = (
        ((br == "Brand#11") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#22") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#33") & sz.between(1, 15) & q.between(20, 30))
    )
    return j.where(brackets).agg(
        dsum(_volume()).alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# q_excess_shippers — the Q20 nested-IN shape (adapted: a supplier's
# shipped share of a part vs the absent partsupp availability)


@query(
    "q_excess_shippers",
    oracle="""
    SELECT s.s_name AS supplier,
           CAST(s.s_suppkey AS BIGINT) AS suppkey
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(l.l_quantity) > (
            SELECT 3.0 * SUM(l2.l_quantity) / COUNT(DISTINCT l2.l_suppkey)
            FROM lineitem l2
            WHERE l2.l_partkey = l.l_partkey
          )
      )
    ORDER BY supplier, suppkey
    """,
)
def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant shippers (the TPC-H Q20 shape): suppliers from one
    nation who shipped MORE THAN 3× AN AVERAGE SUPPLIER'S SHARE of
    some part — an IN subquery whose HAVING carries a correlated
    scalar aggregate (the partsupp availability leg, proxied by the
    part's per-supplier average; TPC-H's 0.5 constant selects nobody
    once supplier count scales past its calibration). Decorrelated:
    per-(supplier, part) sums and per-part totals are two aggs over
    one scan lineage joined on partkey; the qualifying supplier set
    DISTINCTs down to keys and semi-joins the nation-filtered
    supplier dim. Quantities are integral doubles — the sums are
    exact."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    per_sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("qty_sp")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("pp")).agg(
        (
            3.0 * F.sum("l_quantity") / F.countDistinct("l_suppkey")
        ).alias("cut_qty")
    )
    dominant = (
        per_sp.join(per_p, per_sp.l_partkey == per_p.pp)
        .where(F.col("qty_sp") > F.col("cut_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(
            F.broadcast(nat.where(F.col("n_name") == "NATION_5")),
            s.s_nationkey == nat.n_nationkey,
        )
        .join(dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select(
            F.col("s_name").alias("supplier"),
            F.col("s_suppkey").cast("bigint").alias("suppkey"),
        )
        .orderBy("supplier", "suppkey")
    )
