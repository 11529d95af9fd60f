"""Semantic checks for the round-8 batch-6 queries: independent
pandas/numpy re-derivations at sf0.001 (parity proves the engines
agree; this proves they compute the definition)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from open_energy_data_server_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_pdf():
    pdf = pd.read_parquet(f"{SF}/events.parquet")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return pdf


def test_cohort_ltv_matches_pandas(spark, events_pdf):
    got = {
        (r.cohort_week, r.week_offset): (
            r.cohort_size,
            r.cum_revenue,
            r.ltv_per_user,
        )
        for r in QUERIES["q_cohort_ltv"](spark, SF).collect()
    }
    ev = events_pdf.copy()
    ev["day"] = ev["ts"].dt.normalize()
    firsts = ev.groupby("user_id")["day"].min().rename("first_day")
    cohort = (
        firsts - pd.to_timedelta(firsts.dt.weekday, unit="D")
    ).rename("cohort")  # Monday of the first-seen ISO week
    sizes = cohort.value_counts()
    purch = ev[ev["event_type"] == "purchase"].join(
        firsts, on="user_id"
    ).join(cohort, on="user_id")
    purch["week_offset"] = (
        (purch["day"] - purch["first_day"]).dt.days // 7
    ).astype(int)
    purch["sv"] = (purch["value"] * 1_000_000).round().astype("int64")
    wk = (
        purch.groupby(["cohort", "week_offset"])["sv"].sum().reset_index()
    )
    expected = {}
    for c, g in wk.groupby("cohort"):
        g = g.sort_values("week_offset")
        csum = g["sv"].cumsum()
        for off, cs in zip(g["week_offset"], csum):
            key = (c.strftime("%Y-%m-%d"), off)
            expected[key] = (
                int(sizes[c]),
                cs / 1_000_000,
                cs / 1_000_000 / sizes[c],
            )
    assert set(got) == set(expected)
    for k, (size, rev, ltv) in expected.items():
        gs, gr, gl = got[k]
        assert gs == size
        assert gr == pytest.approx(rev, abs=1e-6)
        assert gl == pytest.approx(ltv, abs=1e-6)
    # LTV curves are non-decreasing in week_offset per cohort
    for c in {k[0] for k in got}:
        offs = sorted(k[1] for k in got if k[0] == c)
        vals = [got[(c, o)][1] for o in offs]
        assert vals == sorted(vals)


def test_rapid_repeat_matches_bruteforce(spark, events_pdf):
    got = {
        r.event_type: (r.n_pairs, r.n_users, r.total_gap_seconds)
        for r in QUERIES["q_rapid_repeat_events"](spark, SF).collect()
    }
    expected = {}
    ev = events_pdf.copy()
    ev["sec"] = ev["ts"].values.astype("datetime64[s]").astype("int64")
    for (etype, _uid), g in ev.groupby(["event_type", "user_id"]):
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                gap = int(g.loc[j, "sec"] - g.loc[i, "sec"])
                if gap > 3600:
                    break
                np_, nu, tg, users = expected.get(
                    etype, (0, 0, 0, set())
                )
                users = users | {g.loc[i, "user_id"]}
                expected[etype] = (np_ + 1, len(users), tg + gap, users)
    assert set(got) == set(expected)
    for etype, (np_, nu, tg, _u) in expected.items():
        assert got[etype] == (np_, nu, tg)
    assert sum(v[0] for v in got.values()) > 0  # pairs actually exist


def test_activity_streaks_matches_pandas(spark, events_pdf):
    got = {
        r.max_streak_days: r.n_users
        for r in QUERIES["q_activity_streaks"](spark, SF).collect()
    }
    expected = {}
    days = (
        events_pdf.assign(d=events_pdf["ts"].dt.normalize())
        .drop_duplicates(["user_id", "d"])
        .sort_values(["user_id", "d"])
    )
    for _uid, g in days.groupby("user_id"):
        d = g["d"].to_numpy()
        if len(d) == 1:
            best = 1
        else:
            gaps = np.diff(d).astype("timedelta64[D]").astype(int)
            best, cur = 1, 1
            for gp in gaps:
                cur = cur + 1 if gp == 1 else 1
                best = max(best, cur)
        expected[best] = expected.get(best, 0) + 1
    assert got == expected


def test_dr_baseline_matches_pandas(spark, events_pdf):
    got = {
        r.event_type: (r.n_scored, r.mape)
        for r in QUERIES["q_dr_baseline"](spark, SF).collect()
    }
    ev = events_pdf.copy()
    ev["day"] = ev["ts"].dt.normalize()
    ev["hod"] = ev["ts"].dt.hour
    ev["sv"] = (ev["value"] * 1_000_000).round().astype("int64")
    hourly = (
        ev.groupby(["event_type", "day", "hod"])["sv"].sum().reset_index()
    )
    for etype in got:
        apes, n = [], 0
        for _hod, g in hourly[hourly["event_type"] == etype].groupby("hod"):
            g = g.sort_values("day")
            sv = g["sv"].to_numpy()
            for i in range(10, len(sv)):
                bs = int(sv[i - 10 : i].sum())
                if bs <= 0:
                    continue
                n += 1
                ape = abs(int(sv[i]) * 10 - bs) / bs
                apes.append(round(ape * 1_000_000))
        mape = sum(apes) / 1_000_000 / n
        assert got[etype][0] == n
        assert got[etype][1] == pytest.approx(mape, abs=1e-6)
