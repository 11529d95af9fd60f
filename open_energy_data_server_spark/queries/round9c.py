"""Round-9 batch 3: the two SQL-surface features new in Spark 4 that
the suite did not yet exercise, each under the full DuckDB hash gate.

* ``WITH RECURSIVE`` (SPARK-24497, Spark 4.0+) — driven by the one
  operator class that genuinely NEEDS recursion: a clamped running
  sum (non-associative per-row fold), which no window frame can
  express because the clamp couples every step to the previous
  result;
* correlated ``LATERAL`` subquery with ORDER BY + LIMIT — the
  per-row-top-k join shape, decorrelated by the optimizer into the
  window-group-limit plan rather than a per-outer-row re-scan.

Both are written as literal SQL (``spark.sql`` over temp views) on
purpose: the point is engine-surface parity — the SAME statement text
(modulo nothing) runs on DuckDB as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query

# clamped-SoC recursion: per user, first _SOC_STEPS events by time,
# s_0 = 50, s_n = clamp(s_{n-1} + (value - 50), 0, 100). The delta is
# centered so both clamp rails are actually hit by the generator's
# value distribution (mean ≈ 50, tails to ~490).
_SOC_STEPS = 40

_SOC_SQL = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS step
  FROM events
),
bounded AS (SELECT * FROM seq WHERE step <= {_SOC_STEPS}),
soc(user_id, step, soc) AS (
  SELECT user_id, 0, CAST(50.0 AS DOUBLE)
  FROM (SELECT DISTINCT user_id FROM bounded) u
  UNION ALL
  SELECT b.user_id, CAST(s.step + 1 AS INT),
         LEAST(GREATEST(s.soc + (b.value - 50.0), CAST(0.0 AS DOUBLE)),
               CAST(100.0 AS DOUBLE))
  FROM soc s
  JOIN bounded b ON b.user_id = s.user_id AND b.step = s.step + 1
)
SELECT user_id, CAST(step AS BIGINT) AS step, soc
FROM soc WHERE step > 0
"""


@query("q_recursive_soc", oracle=_SOC_SQL)
def q_recursive_soc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped state-of-charge simulation via ``WITH RECURSIVE``
    (Spark 4 recursive CTE): s_n = clamp(s_{{n-1}} + Δ_n, 0, 100) per
    user over the first {_SOC_STEPS} events — a NON-ASSOCIATIVE
    sequential fold no window frame can express (the clamp couples
    each step to the previous result), the battery/inventory/quota
    recurrence. Each recursion level is one distributed join of
    |users| state rows against the step's events; depth is bounded by
    construction ({_SOC_STEPS} ≤ the default recursion limit). The
    identical statement runs on DuckDB as the oracle. At 100 TB the
    per-series fold would run in applyInPandas (one pass per series,
    like the cubic-spline seam); this query pins the SQL-surface
    parity of the recursion feature itself."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_SOC_SQL)


_LATERAL_SQL = """
SELECT n.n_name AS nation, l.c_custkey AS custkey, l.c_acctbal AS acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 2
) l
"""


@query("q_lateral_topk", oracle=_LATERAL_SQL)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-2 customers by balance via a correlated
    ``LATERAL`` subquery with ORDER BY + LIMIT — the per-row-top-k
    join written the way an analyst writes it. The optimizer must
    DECORRELATE: the plan is one window-group-limit over customer
    partitioned by nationkey joined to nation (check: no per-nation
    re-scan). Deterministic ties via the custkey tiebreak; identical
    statement text is the DuckDB oracle."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_LATERAL_SQL)


_ANOM_STEPS = 40
_ANOM_SQL = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS step
  FROM events
),
bounded AS (SELECT * FROM seq WHERE step <= {_ANOM_STEPS}),
st(user_id, step, n, ewma, ewvar, z, is_anomaly) AS (
  SELECT user_id, 0, CAST(0 AS BIGINT), CAST(0.0 AS DOUBLE),
         CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE), FALSE
  FROM (SELECT DISTINCT user_id FROM bounded) u
  UNION ALL
  SELECT b.user_id, CAST(s.step + 1 AS INT), s.n + 1,
         s.ewma + 0.125 * (b.value - s.ewma),
         (1.0 - 0.125)
           * (s.ewvar + 0.125 * (b.value - s.ewma) * (b.value - s.ewma)),
         CASE WHEN s.n >= 8 AND s.ewvar > 0
              THEN (b.value - s.ewma) / SQRT(s.ewvar) END,
         CASE WHEN s.n >= 8 AND s.ewvar > 0
              THEN ABS((b.value - s.ewma) / SQRT(s.ewvar)) > 3.0
              ELSE FALSE END
  FROM st s JOIN bounded b ON b.user_id = s.user_id AND b.step = s.step + 1
)
SELECT user_id, CAST(step AS BIGINT) AS step, ewma, ewvar, z, is_anomaly
FROM st WHERE step > 0
"""


@query("q_ewma_anomaly_rcte", oracle=_ANOM_SQL)
def q_ewma_anomaly_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.anomaly.stream_ewma_anomaly`` via
    ``WITH RECURSIVE``: the exact EWMA/EW-variance recurrence
    (α = 0.125, warmup 8, |z| > 3) over each user's first
    {_ANOM_STEPS} events — each point scored against the state built
    from its PAST, then absorbed, exactly like the streaming fold
    (tests pin the two implementations row-for-row). Like
    q_recursive_soc this is a non-associative per-row fold no window
    frame expresses; the identical statement is the DuckDB oracle, so
    the streaming operator's arithmetic sits under the full hash
    gate."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ANOM_SQL)
