"""SCD Type 2 operator tests (operators/scd.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.scd import (
    scd2_as_of,
    scd2_current,
    scd2_history,
)
from tests.conftest import SF_DIR_ORACLE


def _stream(spark):
    rows = [
        # key 1: a->a->b->b->a  => versions a, b, a
        (1, datetime(2024, 1, 1, 0), "a", 1),
        (1, datetime(2024, 1, 2, 0), "a", 2),
        (1, datetime(2024, 1, 3, 0), "b", 3),
        (1, datetime(2024, 1, 4, 0), "b", 4),
        (1, datetime(2024, 1, 5, 0), "a", 5),
        # key 2: single observation => one open version
        (2, datetime(2024, 1, 1, 12), "x", 6),
    ]
    return spark.createDataFrame(rows, "k int, ts timestamp, attr string, seq int")


def test_collapse_and_intervals(spark):
    hist = scd2_history(
        _stream(spark), ["k"], "ts", ["attr"], tiebreak_cols=["seq"]
    ).orderBy("k", "version")
    got = [
        (r["k"], r["attr"], r["valid_from"].day,
         r["valid_to"].day if r["valid_to"] else None,
         r["is_current"], r["version"])
        for r in hist.collect()
    ]
    assert got == [
        (1, "a", 1, 3, False, 1),
        (1, "b", 3, 5, False, 2),
        (1, "a", 5, None, True, 3),
        (2, "x", 1, None, True, 1),
    ]


def test_current_and_as_of(spark):
    hist = scd2_history(
        _stream(spark), ["k"], "ts", ["attr"], tiebreak_cols=["seq"]
    )
    cur = {(r["k"], r["attr"]) for r in scd2_current(hist).collect()}
    assert cur == {(1, "a"), (2, "x")}
    snap = {
        (r["k"], r["attr"])
        for r in scd2_as_of(hist, datetime(2024, 1, 3, 12)).collect()
    }
    assert snap == {(1, "b"), (2, "x")}
    # before key 2 ever appeared
    early = scd2_as_of(hist, datetime(2024, 1, 1, 6)).collect()
    assert {(r["k"], r["attr"]) for r in early} == {(1, "a")}


def test_single_exchange(spark):
    """Change lag, interval lead, and version must share ONE shuffle."""
    ev = load_table(spark, SF_DIR_ORACLE, "events")
    hist = scd2_history(
        ev, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    )
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_null_attr_versions(spark):
    """Null-safe change detection: null->value and value->null open."""
    rows = [
        (1, datetime(2024, 1, 1), None, 1),
        (1, datetime(2024, 1, 2), "v", 2),
        (1, datetime(2024, 1, 3), None, 3),
        (1, datetime(2024, 1, 4), None, 4),
    ]
    df = spark.createDataFrame(rows, "k int, ts timestamp, attr string, seq int")
    hist = scd2_history(df, ["k"], "ts", ["attr"], tiebreak_cols=["seq"])
    vals = [r["attr"] for r in hist.orderBy("version").collect()]
    assert vals == [None, "v", None]


def test_apply_equals_full_rebuild(spark):
    """The incremental invariant: scd2_apply(history(prefix), suffix)
    must equal scd2_history(whole stream) row-for-row."""
    from open_energy_data_server_spark.operators.scd import scd2_apply

    rows = [
        (1, datetime(2024, 1, 1), "a", 1),
        (1, datetime(2024, 1, 2), "b", 2),
        (1, datetime(2024, 1, 3), "b", 3),   # repeat: collapses
        (1, datetime(2024, 1, 4), "c", 4),
        (2, datetime(2024, 1, 1), "x", 5),
        (2, datetime(2024, 1, 5), "y", 6),
        (3, datetime(2024, 1, 6), "n", 7),   # key new in the suffix
    ]
    schema = "k int, ts timestamp, attr string, seq int"
    full = spark.createDataFrame(rows, schema)
    prefix = spark.createDataFrame(
        [r for r in rows if r[1] < datetime(2024, 1, 3)], schema
    )
    suffix = spark.createDataFrame(
        [r for r in rows if r[1] >= datetime(2024, 1, 3)], schema
    )

    def canon(df):
        return sorted(
            (r["k"], r["attr"], r["valid_from"], r["valid_to"],
             r["is_current"], r["version"])
            for r in df.collect()
        )

    expected = canon(scd2_history(full, ["k"], "ts", ["attr"]))
    hist = scd2_history(prefix, ["k"], "ts", ["attr"])
    got = canon(scd2_apply(hist, suffix, ["k"], "ts", ["attr"]))
    assert got == expected


def test_apply_plan_exchanges(spark):
    """Round-10 plan pin: the apply plan must not replicate the
    history lineage per consumer (the pre-r10 formulation evaluated it
    five times — 36 Exchange nodes; now history is evaluated twice and
    the late gate / version renumbering ride the collapse window's
    exchange as per-key window aggregates)."""
    from open_energy_data_server_spark.operators.scd import scd2_apply

    ev = load_table(spark, SF_DIR_ORACLE, "events")
    hist = scd2_history(
        ev.filter(F.col("ts") < "2024-01-16"),
        ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"],
    )
    out = scd2_apply(
        hist,
        ev.filter(F.col("ts") >= "2024-01-16").select(
            "user_id", "event_type", "ts", "event_id"
        ),
        ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 6


def test_apply_drops_late_updates_and_passes_untouched(spark):
    from open_energy_data_server_spark.operators.scd import scd2_apply

    schema = "k int, ts timestamp, attr string"
    hist = scd2_history(
        spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1), "a"),
                (1, datetime(2024, 1, 5), "b"),
                (9, datetime(2024, 1, 2), "z"),  # untouched key
            ],
            schema,
        ),
        ["k"], "ts", ["attr"],
    )
    batch = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 3), "LATE"),  # before key 1's open (Jan 5)
            (1, datetime(2024, 1, 7), "c"),
        ],
        schema,
    )
    out = scd2_apply(hist, batch, ["k"], "ts", ["attr"])
    got = sorted(
        (r["k"], r["attr"], r["is_current"], r["version"])
        for r in out.collect()
    )
    assert got == [
        (1, "a", False, 1),
        (1, "b", False, 2),   # closed by the Jan 7 change
        (1, "c", True, 3),
        (9, "z", True, 1),    # untouched passthrough
    ]


def test_apply_equal_ts_conflicting_batch_row_is_late(spark):
    """A batch row with ts EQUAL to the key's open valid_from but
    different attributes must be dropped as late — keeping it would
    tie-order by attribute value and could displace the open version
    into a zero-width interval, shifting version numbers (ADVICE r5)."""
    from open_energy_data_server_spark.operators.scd import scd2_apply

    schema = "k int, ts timestamp, attr string"
    hist = scd2_history(
        spark.createDataFrame(
            [(1, datetime(2024, 1, 1), "a"), (1, datetime(2024, 1, 5), "b")],
            schema,
        ),
        ["k"], "ts", ["attr"],
    )
    batch = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 5), "AAA"),  # equal-ts conflict: late
            (1, datetime(2024, 1, 7), "c"),
        ],
        schema,
    )
    out = scd2_apply(hist, batch, ["k"], "ts", ["attr"])
    got = sorted(
        (r["attr"], r["valid_from"], r["is_current"], r["version"])
        for r in out.collect()
    )
    assert got == [
        ("a", datetime(2024, 1, 1), False, 1),
        ("b", datetime(2024, 1, 5), False, 2),  # survives, re-closed by "c"
        ("c", datetime(2024, 1, 7), True, 3),
    ]
