"""Round-8 batch 2: rolling median, shortlist-graph triangle census,
and a Bloom-pruned dimension join.

Three more shapes a hosted analytics warehouse runs over its
hypertables and star schema: a robust trailing-window statistic (the
rolling-median monitor), a graph-topology census over the affinity
shortlist (closing the graph kit beside q_pagerank / connected
components), and the Bloom-filter semi-join pruning technique that
keeps a selective dim join scan-bound at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query

# ---------------------------------------------------------------------------
# q_rolling_median

_RM_WIN = 7  # trailing days, ROWS 6 PRECEDING


@query(
    "q_rolling_median",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS BIGINT) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           ROUND(quantile_cont(sv, 0.5) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN {_RM_WIN - 1} PRECEDING AND CURRENT ROW
           ) / {SCALE}.0, 6) AS med7
    FROM daily
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling MEDIAN of the daily series total — the
    robust twin of the moving average (one spike day cannot drag it,
    so it is the monitor of choice over spiky feeds). Spark has no
    percentile-over-window, so the frame's ≤7 exact scaled BIGINTs are
    collected per row (collect_list over ROWS BETWEEN — bounded by the
    window width, NEVER by partition size), sorted in-expression, and
    the median read off positionally: odd count → the middle element,
    even → mean of the two middles, exactly DuckDB's quantile_cont
    interpolation at 0.5. Window runs over the daily rollup
    (|days| rows per series), all arithmetic on exact integers until
    the final descale."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * SCALE, 0).cast("bigint")).alias("sv"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_RM_WIN - 1), Window.currentRow)
    )
    frame = F.sort_array(F.collect_list("sv").over(w))
    n = F.size(frame)
    mid_hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    mid_lo = F.element_at(frame, ((n + 1) / 2).cast("int"))
    med = (mid_lo + mid_hi).cast("double") / 2.0
    return daily.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(med / F.lit(float(SCALE)), 6).alias("med7"),
    )


# ---------------------------------------------------------------------------
# q_triangle_count

_TRI_EDGES = 2000  # affinity-shortlist size: the graph is bounded by design


@query(
    "q_triangle_count",
    oracle=f"""
    WITH items AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS MATERIALIZED (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ), edges AS MATERIALIZED (
      SELECT u, v FROM pairs ORDER BY w DESC, u, v LIMIT {_TRI_EDGES}
    ), deg AS MATERIALIZED (
      SELECT k, COUNT(*) AS d
      FROM (SELECT u AS k FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY 1
    ), dir AS MATERIALIZED (
      SELECT CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.v ELSE e.u END AS t
      FROM edges e JOIN deg da ON e.u = da.k JOIN deg db ON e.v = db.k
    ), wedges AS MATERIALIZED (
      SELECT e1.s AS a, e1.t AS b, e2.t AS c
      FROM dir e1 JOIN dir e2 ON e1.t = e2.s
    )
    SELECT CAST((SELECT COUNT(*) FROM dir) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM wedges) AS BIGINT) AS n_wedges,
           CAST((SELECT COUNT(*) FROM wedges w
                 JOIN dir e3 ON e3.s = w.a AND e3.t = w.c) AS BIGINT)
             AS n_triangles
    """,
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the market-basket affinity graph — the
    clustering-topology primitive next to q_pagerank and the
    connected-components dedup kit. Two scale decisions: (1) the graph
    is the SUPPORT-RANKED SHORTLIST (top {_TRI_EDGES} co-order pairs
    under a total order), so |E| is bounded by design — the raw
    co-order graph densifies superlinearly with SF and an unbounded
    triangle join would explode at scale10, while affinity analysis
    always runs on the ranked shortlist anyway; (2) edges are
    DEGREE-ORIENTED (low (deg, id) → high) before the wedge join, the
    standard trick that caps per-vertex wedge fanout at O(sqrt |E|)
    and counts each triangle exactly once. The ≤{_TRI_EDGES}-row edge
    list broadcasts; pair generation is order-key-blocked (C(basket,2)
    per order, never |parts|²)."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    edges = (
        pairs.orderBy(F.col("w").desc(), "u", "v").limit(_TRI_EDGES).select("u", "v")
    )
    ends = edges.select(F.col("u").alias("k")).unionAll(
        edges.select(F.col("v").alias("k"))
    )
    deg = ends.groupBy("k").agg(F.count(F.lit(1)).alias("d"))
    e = edges.join(
        F.broadcast(deg).withColumnRenamed("k", "u").withColumnRenamed("d", "du"),
        "u",
    ).join(
        F.broadcast(deg).withColumnRenamed("k", "v").withColumnRenamed("d", "dv"),
        "v",
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    dir_ = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    # LAZY local checkpoint (round-11, guide §3.3 "materialising an
    # intermediate truncates the plan"): dir_ is referenced FIVE times
    # (e1/e2/e3, the n_edges count, and wedges twice via the tri join)
    # and each reference used to inline the whole
    # scan→pair→rank→orient pipeline into the analyzed plan — 4,666
    # formatted lines whose Catalyst analysis cost ~8 s of
    # first-execution wall (execution itself deduped via
    # ReusedExchange; a plain persist() was tried in round 10 and
    # REJECTED because InMemoryRelation keeps the subtree in-plan).
    # The checkpoint truncates the logical plan to one ≤2000-row RDD
    # leaf shared by name. eager=False keeps the materialization
    # INSIDE the first timed execution (no work moves into plan
    # build) — same discipline as the persisted fuzzy/curation
    # intermediates.
    dir_ = dir_.localCheckpoint(eager=False)
    e1, e2, e3 = dir_.alias("e1"), dir_.alias("e2"), dir_.alias("e3")
    wedges = e1.join(
        F.broadcast(e2), F.col("e1.t") == F.col("e2.s")
    ).select(F.col("e1.s").alias("a"), F.col("e1.t").alias("b"), F.col("e2.t").alias("c"))
    tri = wedges.join(
        F.broadcast(e3),
        (F.col("a") == F.col("e3.s")) & (F.col("c") == F.col("e3.t")),
    )
    return (
        dir_.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(wedges.agg(F.count(F.lit(1)).alias("n_wedges")))
        .crossJoin(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


# Bloom-pruned dim joins: demonstrated through Spark's OWN runtime
# bloom-filter injection (spark.sql.optimizer.runtime.bloomFilter) in
# tests/test_bloom_prune.py rather than a hand-rolled sketch here —
# the aggregation expression (bloom_filter_agg) is engine-internal,
# and re-implementing it user-side would fight the optimizer the
# engine already ships. The test pins the plan shape (might_contain
# on the fact scan fed by a bloom_filter_agg subquery) and result
# exactness on the selective-dim-join shape.
