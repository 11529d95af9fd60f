"""Round-7 additions: spatial density rollup, drift/change detection,
load envelopes, parameterized RPC.

Energy-domain parity: the reference's largest GIS dataset IS a heat
DENSITY grid (crawler/nrw_kwp_waermedichte.py — kW/ha rasterized to
cells); q_grid_density re-expresses that rasterization as a map-only
cell binning + hash agg. CUSUM page-style drift detection and the
chi-square distribution-shift audit are the monitoring companions to
q_data_gaps/q_calendar_scaffold (a crawler that silently starts
reporting shifted values, not just missing rows). q_percentile_bands
is the classic load-envelope dashboard (P10/P50/P90 profile per hour
of day). q_rpc_parameterized drives the PostgREST ``/rpc/<proc>``
GET-argument binding (serving.py) through the correctness gate.

Determinism contract (see _util): fixed-point BIGINT accumulation for
order-dependent sums; CUSUM avoids the non-integer per-series mean
entirely by scaling to the common denominator — ``n·prefix − t·total``
is exact bigint arithmetic, descaled once per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    SCALE,
    _scaled,
    sql_davg,
    sql_dsum,
    davg,
    dsum,
)

_SQL_PTS_V = """
  pts AS (
    SELECT event_id, value,
           (event_id % 400) / 10.0 - 20.0 AS lon,
           (user_id % 120) / 2.0 - 30.0 AS lat
    FROM events
  )"""


@query(
    "q_grid_density",
    oracle=f"""
    WITH {_SQL_PTS_V}
    SELECT CAST(FLOOR(lon / 2.5) AS INTEGER) AS cell_x,
           CAST(FLOOR(lat / 2.5) AS INTEGER) AS cell_y,
           COUNT(*) AS n_points,
           {sql_dsum("value")} AS total_value,
           {sql_davg("value")} AS avg_value
    FROM pts
    GROUP BY 1, 2
    """,
)
def q_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raster-style density rollup: bin points into fixed 2.5° grid
    cells, count + aggregate the measure per cell — the reference's
    heat-density raster (nrw_kwp_waermedichte: kW/ha per cell) as a
    relational plan.

    Scale: map-only projection (two integer floors) into ONE hash agg
    keyed by the bounded cell domain — no join, no window, no sort;
    at 100 TB this is a textbook partial-agg pipeline whose shuffle
    carries |cells| rows per mapper."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "value",
        F.floor(((F.col("event_id") % 400) / 10.0 - 20.0) / 2.5)
        .cast("int")
        .alias("cell_x"),
        F.floor(((F.col("user_id") % 120) / 2.0 - 30.0) / 2.5)
        .cast("int")
        .alias("cell_y"),
    )
    return pts.groupBy("cell_x", "cell_y").agg(
        F.count(F.lit(1)).alias("n_points"),
        dsum("value").alias("total_value"),
        davg("value").alias("avg_value"),
    )


@query(
    "q_cusum_drift",
    oracle=f"""
    WITH s AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * {SCALE}, 0) AS BIGINT) AS v
      FROM events
    ),
    w AS (
      SELECT user_id,
             CAST(SUM(v) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS prefix,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS t,
             CAST(SUM(v) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS total,
             CAST(COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS BIGINT) AS n
      FROM s
    )
    SELECT user_id,
           CAST(MAX(n) AS BIGINT) AS n_obs,
           CAST(MAX(ABS(n * prefix - t * total)) AS DOUBLE)
             / (CAST(MAX(n) AS DOUBLE) * {SCALE}.0) AS max_abs_cusum
    FROM w GROUP BY user_id
    """,
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point screen per series: the maximum absolute
    cumulative deviation from the series mean,
    ``max_t |Σ_{{i≤t}}(x_i − μ)|`` — the classic detector for a crawler
    whose source silently shifts level mid-stream.

    Determinism: the per-series mean never materializes as a float —
    multiply through by n: ``n·Σ_{{i≤t}}x − t·Σx`` is EXACT bigint
    arithmetic on the fixed-point values; the max over exact integers
    is descaled by one double division per series.

    Scale shape: ONE exchange+sort per series key (all four window
    frames share the same partition+order spec → a single Window
    exec), then a hash agg on the same key — already partitioned, so
    no second shuffle."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.select("user_id", "ts", "event_id", _scaled("value").alias("v"))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = wo.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w = s.select(
        "user_id",
        F.sum("v").over(wrun).alias("prefix"),
        F.row_number().over(wo).cast("bigint").alias("t"),
        F.sum("v").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("n"),
    )
    num = F.abs(F.col("n") * F.col("prefix") - F.col("t") * F.col("total"))
    return w.groupBy("user_id").agg(
        F.max("n").alias("n_obs"),
        (
            F.max(num).cast("double")
            / (F.max("n").cast("double") * F.lit(float(SCALE)))
        ).alias("max_abs_cusum"),
    )


@query(
    "q_chisq_drift",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             LEAST(CAST(FLOOR(value / 50.0) AS INTEGER), 9) AS bucket,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END
               AS period,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    m AS (
      SELECT event_type, bucket,
             CAST(SUM(CASE WHEN period = 0 THEN c ELSE 0 END) AS DOUBLE)
               AS oa,
             CAST(SUM(CASE WHEN period = 1 THEN c ELSE 0 END) AS DOUBLE)
               AS ob
      FROM b GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, SUM(oa) AS na, SUM(ob) AS nb
      FROM m GROUP BY 1
    )
    SELECT m.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(CAST(SUM(CAST(ROUND(
              (CASE WHEN m.oa > 0 THEN
                ((m.ob - ((tot.nb * m.oa) / tot.na))
                 * (m.ob - ((tot.nb * m.oa) / tot.na)))
                / ((tot.nb * m.oa) / tot.na)
               ELSE 0.0 END) * {SCALE}, 0) AS BIGINT)) AS BIGINT)
             AS DOUBLE) / {SCALE}.0 AS chi_sq
    FROM m JOIN tot ON m.event_type = tot.event_type
    GROUP BY m.event_type
    """,
)
def q_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift audit per series type: chi-square statistic
    of the measure's bucketed distribution, first half of the window
    vs second (Pearson's test against the earlier period's expected
    frequencies) — the monitoring screen that catches value drift, not
    just missing rows (complementing q_data_gaps/q_calendar_scaffold).

    Rational arithmetic only (no ln like PSI/KL, which would break
    cross-engine determinism): per-bucket terms are identical IEEE
    expressions in both engines, summed fixed-point.

    Scale: rows collapse immediately to (type, bucket) rows with two
    conditional counts in ONE hash agg — everything after runs on
    ≤ |types|·10 rows."""
    ev = load_table(spark, sf_dir, "events")
    period0 = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    m = (
        ev.select(
            "event_type",
            F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(9)).alias(
                "bucket"
            ),
            period0.alias("p0"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.sum(F.when(F.col("p0"), 1).otherwise(0)).cast("double").alias("oa"),
            F.sum(F.when(~F.col("p0"), 1).otherwise(0)).cast("double").alias("ob"),
        )
    )
    tot = m.groupBy("event_type").agg(
        F.sum("oa").alias("na"), F.sum("ob").alias("nb")
    )
    e = (F.col("nb") * F.col("oa")) / F.col("na")
    term = F.when(
        F.col("oa") > 0,
        ((F.col("ob") - e) * (F.col("ob") - e)) / e,
    ).otherwise(0.0)
    return (
        m.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            (
                F.sum(F.round(term * SCALE, 0).cast("bigint")).cast("double")
                / F.lit(float(SCALE))
            ).alias("chi_sq"),
        )
    )


@query(
    "q_percentile_bands",
    oracle="""
    SELECT CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hod,
           quantile_disc(value, 0.10) AS p10,
           quantile_disc(value, 0.50) AS p50,
           quantile_disc(value, 0.90) AS p90
    FROM events GROUP BY 1
    """,
)
def q_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load envelope: P10/P50/P90 of the measure per hour of day — the
    percentile-band profile behind every load dashboard. DISC
    quantiles (actual data values, no interpolation) through the
    two-phase exact quantile operator: distributed (hod, value)
    counts, a bounded coarse histogram, ranking only inside the bucket
    that contains each target rank (operators/quantiles.py — never a
    whole-partition sort per hod)."""
    from open_energy_data_server_spark.operators.quantiles import quantile_disc

    ev = load_table(spark, sf_dir, "events").select(
        F.hour("ts").cast("int").alias("hod"), "value"
    )
    return quantile_disc(
        ev, "hod", "value", [(0.10, "p10"), (0.50, "p50"), (0.90, "p90")]
    )


@query(
    "q_rpc_parameterized",
    oracle="""
    SELECT n_nationkey, n_name
    FROM nation WHERE n_regionkey = 2
    ORDER BY n_nationkey
    """,
)
def q_rpc_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4 parameterized stored procedure: PostgREST binds GET query
    params to procedure arguments (``/rpc/nations_of_region?
    regionkey=2``); the registry template binds them as safe SQL
    literals (plans/procedures.py). The same callable the serving
    facade dispatches to, driven through the correctness gate."""
    from open_energy_data_server_spark.plans.procedures import (
        call_procedure,
        register_procedure,
    )

    load_table(spark, sf_dir, "nation").createOrReplaceTempView(
        "nation_rpc_q"
    )
    register_procedure(
        "nations_of_region_q",
        "SELECT n_nationkey, n_name FROM nation_rpc_q "
        "WHERE n_regionkey = {regionkey} ORDER BY n_nationkey",
        params=("regionkey",),
    )
    return call_procedure(spark, "nations_of_region_q", {"regionkey": "2"})
