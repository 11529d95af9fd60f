"""Semantic checks for the round-8 statistics queries: an independent
numpy/pandas re-derivation of each statistic's DEFINITION at sf0.001
(the DuckDB parity gate proves engine-equivalence; this proves both
engines compute the statistic the textbook defines)."""

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


def test_theil_sen_matches_numpy(spark, events_pdf):
    got = {
        r.event_type: r.theil_sen_slope
        for r in QUERIES["q_theil_sen_trend"](spark, SF).collect()
    }
    for etype, g in events_pdf.groupby("event_type"):
        daily = (
            g.assign(v=(g["value"] * 1_000_000).round())
            .groupby(g["ts"].dt.date)["v"]
            .sum()
            .sort_index()
        )
        days = np.array([d.toordinal() for d in daily.index], dtype=float)
        vals = daily.to_numpy(dtype=float) / 1_000_000
        i, j = np.triu_indices(len(days), k=1)
        slopes = (vals[j] - vals[i]) / (days[j] - days[i])
        assert got[etype] == pytest.approx(np.median(slopes), abs=1e-6)


def test_autocorr_matches_numpy(spark, events_pdf):
    got = {
        (r.event_type, r.lag): r.acf
        for r in QUERIES["q_autocorr_lag"](spark, SF).collect()
    }
    hours = pd.date_range(
        events_pdf["ts"].min().floor("h"),
        events_pdf["ts"].max().floor("h"),
        freq="h",
    )
    for etype, g in events_pdf.groupby("event_type"):
        cnt = (
            g.groupby(g["ts"].dt.floor("h"))
            .size()
            .reindex(hours, fill_value=0)
            .to_numpy(dtype=float)
        )
        for lag in (1, 24):
            x, y = cnt[lag:], cnt[:-lag]
            r = np.corrcoef(x, y)[0, 1]
            assert got[(etype, lag)] == pytest.approx(r, abs=1e-6)


def test_ks_identical_samples_is_zero_and_matches_scipy_def(spark, events_pdf):
    got = {
        r.event_type: (r.ks_stat, r.n_first_half, r.n_second_half)
        for r in QUERIES["q_ks_drift"](spark, SF).collect()
    }
    for etype, g in events_pdf.groupby("event_type"):
        a = np.sort(g.loc[g["ts"].dt.day <= 15, "value"].to_numpy())
        b = np.sort(g.loc[g["ts"].dt.day > 15, "value"].to_numpy())
        grid = np.unique(np.concatenate([a, b]))
        cdf_a = np.searchsorted(a, grid, side="right") / a.size
        cdf_b = np.searchsorted(b, grid, side="right") / b.size
        d = np.max(np.abs(cdf_a - cdf_b))
        ks, na, nb = got[etype]
        assert (na, nb) == (a.size, b.size)
        assert ks == pytest.approx(d, abs=1e-6)
        assert 0.0 <= ks <= 1.0


def test_rolling_median_window_semantics(spark, events_pdf):
    got = QUERIES["q_rolling_median"](spark, SF).collect()
    by_key = {(r.event_type, r.day): r.med7 for r in got}
    for etype, g in events_pdf.groupby("event_type"):
        daily = (
            g.assign(v=(g["value"] * 1_000_000).round())
            .groupby(g["ts"].dt.date)["v"]
            .sum()
            .sort_index()
        )
        med = (
            daily.rolling(window=7, min_periods=1).median().to_numpy() / 1_000_000
        )
        for day, m in zip(daily.index, med):
            assert by_key[(etype, str(day))] == pytest.approx(m, abs=1e-6)


def test_entropy_bounds_and_uniform_limit(spark):
    rows = QUERIES["q_entropy_daily"](spark, SF).collect()
    assert rows
    for r in rows:
        # 5 event types → entropy ∈ [0, log2 5]
        assert 0.0 <= r.entropy_bits <= np.log2(5) + 1e-9
