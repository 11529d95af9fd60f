"""Ordered-funnel analysis over an event stream — "users who did
A, then B, then C" — the events-dashboard companion to the engine's
session windows (SURVEY §2.8's analytics layer; the reference's
Grafana panels chart per-type event series, a funnel is the first
cross-type question asked of the same table).

The classic formulation self-joins the stream once per step (k−1
shuffles of the full stream, each a range join). This one is a single
exchange for ANY depth: process each user's events in time order and
carry, per step, the running min of the previous step's qualifying
timestamps over a strictly-before frame (ROWS … AND 1 PRECEDING). An
event qualifies for step i iff its type matches and some step-i−1
qualifier precedes it. All k windows share one (user, time)
partitioning, so Catalyst plans one Exchange + one Sort with stacked
Window operators — at 100 TB the funnel costs the same shuffle as a
single sessionization pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_user_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-user first-completion timestamps: one row per user with
    ``step_1_ts`` … ``step_k_ts``, where ``step_i_ts`` is the earliest
    time the user completed steps 1..i IN ORDER (strictly increasing
    by the (ts, tiebreak) total order), null if never."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w_prev = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = df
    for i, step in enumerate(steps):
        match = F.col(type_col) == step
        if i == 0:
            qual = F.when(match, F.col(ts_col))
        else:
            prev_seen = F.min(F.col(f"__q{i - 1}")).over(w_prev)
            qual = F.when(match & prev_seen.isNotNull(), F.col(ts_col))
        out = out.withColumn(f"__q{i}", qual)
    return out.groupBy(user_col).agg(
        *[
            F.min(F.col(f"__q{i}")).alias(f"step_{i + 1}_ts")
            for i in range(len(steps))
        ]
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """One row: ``step_i_users`` = users who completed steps 1..i in
    order (monotonically non-increasing across i)."""
    per_user = funnel_user_steps(
        df, user_col, ts_col, type_col, steps, tiebreak_cols
    )
    return per_user.agg(
        *[
            F.count(F.col(f"step_{i + 1}_ts"))
            .cast("bigint")
            .alias(f"step_{i + 1}_users")
            for i in range(len(steps))
        ]
    )
