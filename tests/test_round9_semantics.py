"""Third-implementation semantic pins for the round-9 operators:
the streaming EWMA anomaly fold vs the recursive-CTE batch twin, the
clamped-SoC recursion vs a plain-Python fold, and the streaming
minhash signature vs the batch signature (the dedup agreement)."""

from __future__ import annotations

import math

import pytest


def test_streaming_fold_equals_recursive_sql(spark):
    """streaming.anomaly._score_batch (the operator's actual fold)
    reproduces q_ewma_anomaly_rcte (the WITH RECURSIVE twin) row for
    row at sf0.001 — same scoring-before-absorbing order, same warmup
    gate, bit-identical doubles (the chain is sequential on both
    sides)."""
    import datetime as dt

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.queries import QUERIES
    from open_energy_data_server_spark.streaming.anomaly import _score_batch

    sf = "/root/testdata/sf0.001"
    got = {
        (r.user_id, r.step): (r.ewma, r.ewvar, r.z, r.is_anomaly)
        for r in QUERIES["q_ewma_anomaly_rcte"](spark, sf).collect()
    }
    ev = (
        load_table(spark, sf, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    n_checked = 0
    for uid, grp in ev.groupby("user_id"):
        head = grp.head(40)
        frame, (n, ewma, ewvar) = _score_batch(
            (uid,), head, (0, 0.0, 0.0), 0.125, 3.0, 8
        )
        for step, (z, flag) in enumerate(
            zip(frame["z"], frame["is_anomaly"]), start=1
        ):
            want = got[(uid, step)]
            if z is None or (isinstance(z, float) and math.isnan(z)):
                assert want[2] is None  # warmup rows carry no score
            else:
                assert want[2] == pytest.approx(z, abs=1e-12)
            assert bool(want[3]) == bool(flag)
            n_checked += 1
        # final state equals the SQL's last-step ewma/ewvar
        last = got[(uid, len(frame))]
        assert last[0] == pytest.approx(ewma, abs=1e-12)
        assert last[1] == pytest.approx(ewvar, abs=1e-12)
    assert n_checked > 100


def test_rcte_statements_equal_fold_execution(spark):
    """The executed per-series folds of q_recursive_soc /
    q_ewma_anomaly_rcte are BIT-IDENTICAL to their ``WITH RECURSIVE``
    oracle statements run through Spark's own recursive-CTE executor —
    the SQL surface stays exercised (and exact) even though the
    registered queries no longer execute the UnionLoop."""
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.queries import QUERIES
    from open_energy_data_server_spark.queries.round9c import _ANOM_SQL, _SOC_SQL

    sf = "/root/testdata/sf0.001"
    load_table(spark, sf, "events").createOrReplaceTempView("events")
    for name, sql in (
        ("q_recursive_soc", _SOC_SQL),
        ("q_ewma_anomaly_rcte", _ANOM_SQL),
    ):
        fold = QUERIES[name](spark, sf)
        rcte = spark.sql(sql)
        assert fold.columns == rcte.columns
        key = [fold.columns[0], fold.columns[1]]  # (user_id, step)
        got = {tuple(r[:2]): tuple(r[2:]) for r in fold.collect()}
        want = {tuple(r[:2]): tuple(r[2:]) for r in rcte.collect()}
        assert len(got) == len(want) > 0, name
        # exact equality, including float bits and NULL placement
        assert got == want, name


def test_recursive_soc_equals_python_fold(spark):
    """q_recursive_soc (WITH RECURSIVE clamped running sum) equals the
    plain sequential fold it models."""
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r.user_id, r.step): r.soc
        for r in QUERIES["q_recursive_soc"](spark, sf).collect()
    }
    ev = (
        load_table(spark, sf, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    n_checked = 0
    for uid, grp in ev.groupby("user_id"):
        soc = 50.0
        for step, x in enumerate(grp.head(40)["value"], start=1):
            soc = min(max(soc + (float(x) - 50.0), 0.0), 100.0)
            assert got[(uid, step)] == pytest.approx(soc, abs=1e-12)
            n_checked += 1
    assert n_checked > 100
