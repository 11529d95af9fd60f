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
from pyspark.sql import functions as F

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


def _first_event_values(ev: DataFrame, steps: int):
    """(user_id, vals) with ``vals`` = the first ``steps`` event values
    per user in (ts, event_id) order — the fold input both recursive
    queries share. One hash aggregation (collect_list rides a single
    exchange on user_id), per-group ``array_sort`` + ``slice`` instead
    of a ROW_NUMBER window over the full event stream: (ts, event_id)
    is a unique key per user (the RCTE's ROW_NUMBER tie-break relies
    on the same invariant), so the struct sort reproduces the step
    order exactly."""
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .agg(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "value"))
                    ),
                    1,
                    steps,
                ),
                lambda s: s["value"].cast("double"),
            ).alias("vals")
        )
    )


def recursive_soc_fold(ev: DataFrame, steps: int = _SOC_STEPS) -> DataFrame:
    """The per-series fold execution of the clamped-SoC recursion —
    identical IEEE-754 op sequence to ``_SOC_SQL``'s recursion step
    (``LEAST(GREATEST(s + (v - 50.0), 0.0), 100.0)`` per event, left
    fold in step order via the ``aggregate`` HOF), so results are
    bit-identical (pinned by tests/test_round9_semantics.py against
    the live ``WITH RECURSIVE`` statement)."""
    acc0 = F.struct(
        F.lit(50.0).alias("s"),
        F.expr("CAST(array() AS ARRAY<DOUBLE>)").alias("out"),
    )

    def step(acc, v):
        s2 = F.least(
            F.greatest(acc["s"] + (v - F.lit(50.0)), F.lit(0.0)), F.lit(100.0)
        )
        return F.struct(
            s2.alias("s"), F.concat(acc["out"], F.array(s2)).alias("out")
        )

    folded = _first_event_values(ev, steps).select(
        "user_id",
        F.aggregate("vals", acc0, step, lambda a: a["out"]).alias("socs"),
    )
    return folded.select("user_id", F.posexplode("socs")).select(
        "user_id",
        (F.col("pos") + 1).cast("bigint").alias("step"),
        F.col("col").alias("soc"),
    )


@query("q_recursive_soc", oracle=_SOC_SQL)
def q_recursive_soc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clamped state-of-charge simulation: s_n = clamp(s_{{n-1}} + Δ_n,
    0, 100) per user over the first {_SOC_STEPS} events — a
    NON-ASSOCIATIVE sequential fold no window frame can express (the
    clamp couples each step to the previous result), the
    battery/inventory/quota recurrence. The DuckDB oracle is the
    ``WITH RECURSIVE`` statement (_SOC_SQL); the EXECUTED form is the
    per-series fold (one hash aggregation + an ``aggregate`` HOF over
    each user's ≤{_SOC_STEPS} values, all JVM expressions) — the same
    recurrence as ONE job instead of {_SOC_STEPS} UnionLoop
    iterations × ~4 tiny jobs each, which measured 21–31 s of pure
    per-iteration scheduling floor cold (round-10 profiling; JIT
    exonerated). Bit-identical to the live recursive statement —
    tests/test_round9_semantics.py runs _SOC_SQL through Spark's own
    recursive-CTE executor and compares exactly, so the SQL surface
    stays exercised."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")  # oracle/SQL-surface parity
    return recursive_soc_fold(ev)


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


def ewma_anomaly_fold(ev: DataFrame, steps: int = _ANOM_STEPS) -> DataFrame:
    """Per-series fold execution of the EWMA/EW-variance recurrence —
    the identical IEEE-754 op sequence as ``_ANOM_SQL``'s recursion
    step (score against the PRE-update state, then absorb), left fold
    in step order via the ``aggregate`` HOF. Bit-identical to the live
    ``WITH RECURSIVE`` statement (pinned by
    tests/test_round9_semantics.py)."""
    acc0 = F.struct(
        F.lit(0).cast("bigint").alias("n"),
        F.lit(0.0).alias("ewma"),
        F.lit(0.0).alias("ewvar"),
        F.expr(
            "CAST(array() AS ARRAY<STRUCT<ewma: DOUBLE, ewvar: DOUBLE,"
            " z: DOUBLE, is_anomaly: BOOLEAN>>)"
        ).alias("out"),
    )

    def step(acc, v):
        d = v - acc["ewma"]
        warmed = (acc["n"] >= F.lit(8)) & (acc["ewvar"] > F.lit(0.0))
        z = F.when(warmed, d / F.sqrt(acc["ewvar"]))
        is_anom = F.when(
            warmed, F.abs(d / F.sqrt(acc["ewvar"])) > F.lit(3.0)
        ).otherwise(F.lit(False))
        new_ewma = acc["ewma"] + F.lit(0.125) * d
        new_ewvar = (F.lit(1.0) - F.lit(0.125)) * (
            acc["ewvar"] + F.lit(0.125) * d * d
        )
        return F.struct(
            (acc["n"] + F.lit(1)).alias("n"),
            new_ewma.alias("ewma"),
            new_ewvar.alias("ewvar"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        new_ewma.alias("ewma"),
                        new_ewvar.alias("ewvar"),
                        z.alias("z"),
                        is_anom.alias("is_anomaly"),
                    )
                ),
            ).alias("out"),
        )

    folded = _first_event_values(ev, steps).select(
        "user_id",
        F.aggregate("vals", acc0, step, lambda a: a["out"]).alias("st"),
    )
    return folded.select("user_id", F.posexplode("st")).select(
        "user_id",
        (F.col("pos") + 1).cast("bigint").alias("step"),
        F.col("col")["ewma"].alias("ewma"),
        F.col("col")["ewvar"].alias("ewvar"),
        F.col("col")["z"].alias("z"),
        F.col("col")["is_anomaly"].alias("is_anomaly"),
    )


@query("q_ewma_anomaly_rcte", oracle=_ANOM_SQL)
def q_ewma_anomaly_rcte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of ``streaming.anomaly.stream_ewma_anomaly``: the
    exact EWMA/EW-variance recurrence (α = 0.125, warmup 8, |z| > 3)
    over each user's first {_ANOM_STEPS} events — each point scored
    against the state built from its PAST, then absorbed, exactly like
    the streaming fold (tests pin the two implementations
    row-for-row). The DuckDB oracle is the ``WITH RECURSIVE``
    statement (_ANOM_SQL); the EXECUTED form is the per-series fold
    (see q_recursive_soc — one job instead of the 40-iteration
    UnionLoop whose ~170 ms/job scheduling floor owned the cold wall).
    Bit-identical to the live recursive statement, which
    tests/test_round9_semantics.py still executes through Spark's own
    recursive-CTE machinery for the SQL-surface pin."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")  # oracle/SQL-surface parity
    return ewma_anomaly_fold(ev)
