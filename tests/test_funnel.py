"""Funnel operator semantics (operators/funnel.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.funnel import (
    funnel_counts,
    funnel_user_steps,
)
from tests.conftest import SF_DIR_ORACLE


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h), t, i) for i, (u, d, h, t) in enumerate(rows)],
        "user_id int, ts timestamp, event_type string, event_id int",
    )


def test_order_matters(spark):
    df = _ev(
        spark,
        [
            # user 1: full ordered funnel
            (1, 1, 0, "view"), (1, 2, 0, "click"), (1, 3, 0, "purchase"),
            # user 2: purchase BEFORE click -> only steps 1-2 count
            (2, 1, 0, "view"), (2, 2, 0, "purchase"), (2, 3, 0, "click"),
            # user 3: click with no prior view -> only nothing past step 1? no view at all
            (3, 1, 0, "click"), (3, 2, 0, "purchase"),
            # user 4: view only
            (4, 1, 0, "view"),
        ],
    )
    row = funnel_counts(
        df, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], tiebreak_cols=["event_id"],
    ).collect()[0]
    assert (row["step_1_users"], row["step_2_users"], row["step_3_users"]) == (
        3, 2, 1,
    )


def test_first_completion_timestamps(spark):
    df = _ev(
        spark,
        [
            (1, 1, 0, "view"),
            (1, 1, 5, "click"),     # qualifies (view before)
            (1, 2, 0, "view"),
            (1, 2, 5, "click"),     # later qualifying click ignored by min
            (1, 3, 0, "purchase"),
        ],
    )
    r = funnel_user_steps(
        df, "user_id", "ts", "event_type",
        ["view", "click", "purchase"], tiebreak_cols=["event_id"],
    ).collect()[0]
    assert r["step_1_ts"] == datetime(2024, 1, 1, 0)
    assert r["step_2_ts"] == datetime(2024, 1, 1, 5)
    assert r["step_3_ts"] == datetime(2024, 1, 3, 0)


def test_same_timestamp_is_not_before(spark):
    """Strictly-before frame: a click at the SAME instant as the only
    view must not qualify (the 1-PRECEDING frame excludes peers at the
    same (ts, tiebreak) position only when ordered after them)."""
    df = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), "click", 0),  # tiebreak puts click first
            (1, datetime(2024, 1, 1), "view", 1),
        ],
        "user_id int, ts timestamp, event_type string, event_id int",
    )
    r = funnel_user_steps(
        df, "user_id", "ts", "event_type", ["view", "click"],
        tiebreak_cols=["event_id"],
    ).collect()[0]
    assert r["step_1_ts"] is not None and r["step_2_ts"] is None


def test_depth_k_single_exchange(spark):
    """Any funnel depth must plan ONE exchange before the final agg."""
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    out = funnel_user_steps(
        ev, "user_id", "ts", "event_type",
        ["view", "click", "purchase", "error", "signup"],
        tiebreak_cols=["event_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1


def test_empty_steps_raises(spark):
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    with pytest.raises(ValueError):
        funnel_user_steps(ev, "user_id", "ts", "event_type", [])
