"""Semantic checks for the round-8 batch-5 queries: independent
pandas re-derivations of interval coalescing, audience Jaccard, and
windowFunnel semantics at sf0.001 (the DuckDB parity gate proves
engine-equivalence; this proves the definition)."""

from __future__ import annotations

from itertools import combinations

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


def _sec_boundaries(a, b):
    # date_diff('second', a, b) semantics: second-BOUNDARY crossings,
    # i.e. floor(epoch b) - floor(epoch a) -- not a truncated delta
    return int(b.value // 10**9 - a.value // 10**9)


def test_interval_coalesce_matches_pandas(spark, events_pdf):
    row = QUERIES["q_interval_coalesce"](spark, SF).collect()[0]
    err = events_pdf[events_pdf["event_type"] == "error"].copy()
    err["s"] = err["ts"]
    # FLOOR semantics (engine/oracle), not truncation-toward-zero
    err["e"] = err["ts"] + pd.to_timedelta(
        np.floor(err["value"]).astype(int) * 300, unit="s"
    )
    n_users, n_raw, n_merged, covered, longest = 0, 0, 0, 0, 0
    for _uid, g in err.groupby("user_id"):
        n_users += 1
        g = g.sort_values(["s", "e"])
        cur_s = cur_e = None
        for s, e in zip(g["s"], g["e"]):
            n_raw += 1
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    n_merged += 1
                    d = _sec_boundaries(cur_s, cur_e)
                    covered += d
                    longest = max(longest, d)
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            n_merged += 1
            d = _sec_boundaries(cur_s, cur_e)
            covered += d
            longest = max(longest, d)
    assert (
        row.n_users,
        row.n_raw_windows,
        row.n_merged_windows,
        row.covered_seconds,
        row.longest_window_seconds,
    ) == (n_users, n_raw, n_merged, covered, longest)
    assert n_merged < n_raw  # the fixture data actually overlaps


def test_audience_overlap_matches_pandas(spark, events_pdf):
    got = {
        (r.type_a, r.type_b): (r.n_both, r.n_a, r.n_b, r.jaccard)
        for r in QUERIES["q_audience_overlap"](spark, SF).collect()
    }
    sets = {
        t: set(events_pdf.loc[events_pdf["event_type"] == t, "user_id"])
        for t in ("click", "error", "purchase", "signup", "view")
    }
    assert len(got) == 10
    for a, b in combinations(sorted(sets), 2):
        both = len(sets[a] & sets[b])
        jac = both / len(sets[a] | sets[b])
        gb, ga_, gb_, gj = got[(a, b)]
        assert (gb, ga_, gb_) == (both, len(sets[a]), len(sets[b]))
        assert gj == pytest.approx(jac, abs=1e-6)


def test_window_funnel_matches_pandas(spark, events_pdf):
    got = {
        r.level: r.n_users
        for r in QUERIES["q_window_funnel"](spark, SF).collect()
    }
    budget = pd.Timedelta(minutes=1440)
    lvl = {1: 0, 2: 0, 3: 0}
    for _uid, g in events_pdf.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "ts"]
        if views.empty:
            continue
        t1 = views.min()
        lvl[1] += 1
        clicks = g.loc[
            (g["event_type"] == "click")
            & (g["ts"] > t1)
            & (g["ts"] <= t1 + budget),
            "ts",
        ]
        if clicks.empty:
            continue
        t2 = clicks.min()
        lvl[2] += 1
        purchases = g.loc[
            (g["event_type"] == "purchase")
            & (g["ts"] > t2)
            & (g["ts"] <= t1 + budget),
            "ts",
        ]
        if not purchases.empty:
            lvl[3] += 1
    assert got == lvl
    assert lvl[1] > lvl[2] > lvl[3] > 0  # a real funnel, not degenerate
