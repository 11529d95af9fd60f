"""Round-8 batch 5: interval algebra, audience overlap, and the
time-constrained window funnel.

Three genres still absent after batch 4:

* interval coalescing — merge each user's overlapping incident
  windows into maximal covered spans (the outage/maintenance-window
  union every grid operator computes; q_gaps_islands finds gaps in
  POINT streams, this merges [start, end) INTERVALS);
* audience overlap — pairwise Jaccard between event-type audiences
  from ONE pass that reduces users to a 5-bit membership mask (the
  cross-sell/contamination matrix; q_vocab_overlap is the same math
  over document vocabularies, this is the user-set form with a
  mask-rollup plan that never self-joins the fact table);
* window funnel — the longest ordered step prefix completed within a
  fixed time budget of the first step (ClickHouse ``windowFunnel``
  semantics; q_funnel_steps is the unconstrained-order variant).

House discipline throughout: integer/fixed-point reductions, total
orderings with explicit tiebreaks, oracle SQL formulated
independently (self-joins / correlated scans where that is the
natural SQL) so the two engines cross-check real semantics, not a
shared plan.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query

# ---------------------------------------------------------------------------
# q_interval_coalesce — merged incident windows per user, fleet rollup

_IC_TYPE = "error"


@query(
    "q_interval_coalesce",
    oracle=f"""
    WITH iv AS (
      SELECT user_id, ts AS s,
             ts + INTERVAL 1 SECOND * CAST(FLOOR(value) * 300 AS BIGINT) AS e
      FROM events WHERE event_type = '{_IC_TYPE}'
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    ), merged AS (
      SELECT user_id, island,
             MIN(s) AS ms, MAX(e) AS me, COUNT(*) AS n_raw
      FROM islands GROUP BY 1, 2
    )
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(n_raw) AS BIGINT) AS n_raw_windows,
           CAST(COUNT(*) AS BIGINT) AS n_merged_windows,
           CAST(SUM(CAST(date_diff('second', ms, me) AS BIGINT)) AS BIGINT)
             AS covered_seconds,
           CAST(MAX(CAST(date_diff('second', ms, me) AS BIGINT)) AS BIGINT)
             AS longest_window_seconds
    FROM merged
    """,
)
def q_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing: each '{_IC_TYPE}' event opens an incident
    window [ts, ts + ⌊value⌋·300 seconds) — five minutes of outage per
    unit of error magnitude; overlapping/touching windows of
    the same user merge into maximal covered spans (the gaps-and-
    islands pattern lifted from points to intervals — an interval
    whose start exceeds the running MAX of prior ends begins a new
    island; a plain lag(e) would under-merge when an earlier interval
    swallows a later one). Fleet rollup: users, raw vs merged window
    counts, total and longest covered seconds. The windows are
    PARTITIONed BY user_id — a high-cardinality key, so the ordered
    scan parallelizes with the user count at any scale; the final agg
    is a 1-row reduce."""
    iv = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == _IC_TYPE)
        .select(
            "user_id",
            F.col("ts").alias("s"),
            (
                F.col("ts")
                + F.make_interval(secs=(F.floor("value") * 300).cast("double"))
            ).alias("e"),
        )
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = marked.select(
        "user_id", "s", "e", F.sum("new_island").over(w_run).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"),
        F.max("e").alias("me"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    dur = (F.unix_timestamp("me") - F.unix_timestamp("ms")).cast("bigint")
    return merged.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.sum("n_raw").cast("bigint").alias("n_raw_windows"),
        F.count(F.lit(1)).cast("bigint").alias("n_merged_windows"),
        F.sum(dur).cast("bigint").alias("covered_seconds"),
        F.max(dur).cast("bigint").alias("longest_window_seconds"),
    )


# ---------------------------------------------------------------------------
# q_audience_overlap — pairwise Jaccard between event-type audiences

_AO_TYPES = ("click", "error", "purchase", "signup", "view")  # sorted


@query(
    "q_audience_overlap",
    oracle=f"""
    WITH membership AS (
      SELECT DISTINCT user_id, event_type FROM events
      WHERE event_type IN ({", ".join(f"'{t}'" for t in _AO_TYPES)})
        AND user_id IS NOT NULL
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both,
           CAST((SELECT COUNT(*) FROM membership m
                 WHERE m.event_type = a.event_type) AS BIGINT) AS n_a,
           CAST((SELECT COUNT(*) FROM membership m
                 WHERE m.event_type = b.event_type) AS BIGINT) AS n_b,
           ROUND(CAST(COUNT(*) AS DOUBLE) /
                 ((SELECT COUNT(*) FROM membership m
                   WHERE m.event_type = a.event_type)
                  + (SELECT COUNT(*) FROM membership m
                     WHERE m.event_type = b.event_type)
                  - COUNT(*)), 6) AS jaccard
    FROM membership a JOIN membership b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
)
def q_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap: for every unordered pair of event
    types, the user-set intersection, per-type audience sizes, and
    Jaccard similarity — the cross-sell / cannibalization matrix.

    The oracle states the semantics naturally (distinct membership
    self-joined on user). The engine NEVER self-joins: one pass
    reduces each user to a {len(_AO_TYPES)}-bit membership MASK, the
    masks roll up to ≤2^{len(_AO_TYPES)} (mask, count) rows, and every
    pairwise intersection/union is integer arithmetic over that
    bounded rollup exploded to the {len(_AO_TYPES) * (len(_AO_TYPES) - 1) // 2}
    pairs — so the shuffled bytes are one bigint per user regardless
    of how many event types or pairs are asked for, where the
    self-join shuffles the membership table once per side and its
    output grows with Σ|pair intersections|."""
    ev = load_table(spark, sf_dir, "events")
    bit = F.lit(0)
    for i, t in enumerate(_AO_TYPES):
        bit = bit + F.when(F.col("event_type") == t, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    # bit_or over per-(user, type) pre-distinct rows = the user's mask.
    # An unidentified (NULL) user is no audience member — and the
    # oracle's equi-self-join could never match it anyway
    masks = (
        ev.where(
            F.col("event_type").isin(*_AO_TYPES)
            & F.col("user_id").isNotNull()
        )
        .select("user_id", bit.alias("b"))
        .groupBy("user_id")
        .agg(F.bit_or("b").alias("mask"))
    )
    rollup = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = [
        (a_i, b_i) for a_i, b_i in combinations(range(len(_AO_TYPES)), 2)
    ]
    pair_rows = []
    for a_i, b_i in pairs:
        both = (1 << a_i) | (1 << b_i)
        pair_rows.append(
            F.struct(
                F.lit(_AO_TYPES[a_i]).alias("type_a"),
                F.lit(_AO_TYPES[b_i]).alias("type_b"),
                F.lit(1 << a_i).alias("bit_a"),
                F.lit(1 << b_i).alias("bit_b"),
                F.lit(both).alias("bit_both"),
            )
        )
    exploded = rollup.select(
        "mask", "cnt", F.explode(F.array(*pair_rows)).alias("p")
    )
    m, c = F.col("mask"), F.col("cnt")
    agg = exploded.groupBy("p.type_a", "p.type_b").agg(
        F.sum(
            F.when(m.bitwiseAND(F.col("p.bit_both")) == F.col("p.bit_both"), c)
            .otherwise(F.lit(0))
        ).alias("n_both"),
        F.sum(
            F.when(m.bitwiseAND(F.col("p.bit_a")) != 0, c).otherwise(F.lit(0))
        ).alias("n_a"),
        F.sum(
            F.when(m.bitwiseAND(F.col("p.bit_b")) != 0, c).otherwise(F.lit(0))
        ).alias("n_b"),
    )
    nb, na, n2 = F.col("n_both"), F.col("n_a"), F.col("n_b")
    # the oracle's INNER self-join emits no row for a pair with zero
    # common users — match that (and avoid 0/0 when both audiences
    # are empty) by dropping zero-intersection pairs
    return (
        agg.where(nb > 0)
        .select(
            "type_a",
            "type_b",
            nb.cast("bigint").alias("n_both"),
            na.cast("bigint").alias("n_a"),
            n2.cast("bigint").alias("n_b"),
            F.round(nb.cast("double") / (na + n2 - nb), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# q_window_funnel — ordered steps completed within a time budget

_WF_STEPS = ("view", "click", "purchase")
_WF_WINDOW_MIN = 1440  # 24 h


@query(
    "q_window_funnel",
    oracle=f"""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS ts1 FROM events
      WHERE event_type = '{_WF_STEPS[0]}' GROUP BY 1
    ), t2 AS (
      SELECT e.user_id, MIN(e.ts) AS ts2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = '{_WF_STEPS[1]}' AND e.ts > t1.ts1
        AND e.ts <= t1.ts1 + INTERVAL {_WF_WINDOW_MIN} MINUTE
      GROUP BY 1
    ), t3 AS (
      SELECT e.user_id, MIN(e.ts) AS ts3
      FROM events e
      JOIN t1 ON e.user_id = t1.user_id
      JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = '{_WF_STEPS[2]}' AND e.ts > t2.ts2
        AND e.ts <= t1.ts1 + INTERVAL {_WF_WINDOW_MIN} MINUTE
      GROUP BY 1
    )
    SELECT CAST(level AS INT) AS level, CAST(n_users AS BIGINT) AS n_users
    FROM (
      SELECT 1 AS level, COUNT(*) AS n_users FROM t1
      UNION ALL SELECT 2, COUNT(*) FROM t2
      UNION ALL SELECT 3, COUNT(*) FROM t3
    )
    """,
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained funnel (ClickHouse ``windowFunnel``
    semantics): users reaching each prefix of
    {" → ".join(_WF_STEPS)} where every later step follows the
    previous one strictly AND lands within {_WF_WINDOW_MIN} minutes of
    the user's FIRST step-1 event — q_funnel_steps without the clock
    is the lenient cousin. Greedy-earliest anchoring (first view, then
    first qualifying click, then first qualifying purchase) makes the
    level assignment deterministic.

    Plan: every level's anchor is CONSTANT per user, so the whole
    cascade is three conditional window-MINs chained over the SAME
    ``PARTITION BY user_id`` spec — ts1 = min(view ts), ts2 =
    min(click ts qualified against ts1), ts3 = min(purchase ts
    qualified against ts2) — and Catalyst executes them on ONE
    user-keyed exchange (an earlier join-per-level formulation cost
    11 exchanges; this one costs 2: the user shuffle + the final
    1-row reduce, with the per-user dedup agg reusing the window's
    partitioning). No per-user event arrays, no Python."""
    ev = load_table(spark, sf_dir, "events")
    budget = F.expr(f"INTERVAL {_WF_WINDOW_MIN} MINUTES")
    w = Window.partitionBy("user_id")
    ts, etype = F.col("ts"), F.col("event_type")
    lvl1 = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.min(F.when(etype == _WF_STEPS[0], ts)).over(w).alias("ts1"),
    )
    lvl2 = lvl1.select(
        "*",
        F.min(
            F.when(
                (etype == _WF_STEPS[1])
                & (ts > F.col("ts1"))
                & (ts <= F.col("ts1") + budget),
                ts,
            )
        )
        .over(w)
        .alias("ts2"),
    )
    lvl3 = lvl2.select(
        "*",
        F.min(
            F.when(
                (etype == _WF_STEPS[2])
                & (ts > F.col("ts2"))
                & (ts <= F.col("ts1") + budget),
                ts,
            )
        )
        .over(w)
        .alias("ts3"),
    )
    per_user = lvl3.groupBy("user_id").agg(
        F.max("ts1").alias("ts1"),
        F.max("ts2").alias("ts2"),
        F.max("ts3").alias("ts3"),
    )
    counts = per_user.agg(
        F.count("ts1").alias("n1"),
        F.count("ts2").alias("n2"),
        F.count("ts3").alias("n3"),
    )
    return counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).cast("int").alias("level"),
                        F.col(f"n{i + 1}").cast("bigint").alias("n_users"),
                    )
                    for i in range(3)
                ]
            )
        ).alias("r")
    ).select("r.level", "r.n_users")
