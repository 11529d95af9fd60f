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


def test_cross_correlation_matches_numpy(spark, events_pdf):
    got = {
        r.lag: r.xcorr
        for r in QUERIES["q_cross_correlation"](spark, SF).collect()
    }
    hours = pd.date_range(
        events_pdf["ts"].min().floor("h"),
        events_pdf["ts"].max().floor("h"),
        freq="h",
    )

    def series(et):
        g = events_pdf[events_pdf["event_type"] == et]
        return (
            g.groupby(g["ts"].dt.floor("h"))
            .size()
            .reindex(hours, fill_value=0)
            .to_numpy(dtype=float)
        )

    a, b = series("click"), series("purchase")
    for lag in (-2, -1, 0, 1, 2):
        # engine pairs a_t with b_{t-lag} (LAG of b by `lag`)
        if lag > 0:
            x, y = a[lag:], b[:-lag]
        elif lag < 0:
            x, y = a[:lag], b[-lag:]
        else:
            x, y = a, b
        r = np.corrcoef(x, y)[0, 1]
        assert got[lag] == pytest.approx(r, abs=1e-6)


def test_churn_hazard_definition(spark, events_pdf):
    rows = QUERIES["q_churn_hazard"](spark, SF).collect()
    life = events_pdf.groupby("user_id")["ts"].agg(["min", "max"])
    weeks = ((life["max"].dt.date - life["min"].dt.date).map(
        lambda d: d.days
    ) // 7).to_numpy()
    for r in rows:
        churned = int((weeks == r.week).sum())
        at_risk = int((weeks >= r.week).sum())
        assert (r.n_churned, r.n_at_risk) == (churned, at_risk)
        assert r.hazard == pytest.approx(churned / at_risk, abs=1e-6)
    # every user exits exactly once
    assert sum(r.n_churned for r in rows) == len(weeks)


def test_seasonality_strength_bounds_and_numpy(spark, events_pdf):
    got = {
        r.event_type: r.seasonal_strength
        for r in QUERIES["q_seasonality_strength"](spark, SF).collect()
    }
    for etype, g in events_pdf.groupby("event_type"):
        x = g["value"].to_numpy(dtype=float)
        hod = g["ts"].dt.hour.to_numpy()
        s = np.zeros_like(x)
        for h in np.unique(hod):
            mask = hod == h
            s[mask] = x[mask].mean()
        m = x.mean()
        strength = 1.0 - ((x - s) ** 2).sum() / ((x - m) ** 2).sum()
        assert got[etype] == pytest.approx(strength, abs=1e-4)
        assert got[etype] >= -1e-9  # within-group means never add variance


def test_forecast_backtest_matches_numpy(spark, events_pdf):
    got = {
        r.event_type: (r.mae, r.rmse)
        for r in QUERIES["q_forecast_backtest"](spark, SF).collect()
    }
    for etype, g in events_pdf.groupby("event_type"):
        daily = (
            g.assign(v=(g["value"] * 1_000_000).round())
            .groupby(g["ts"].dt.date)["v"]
            .sum()
            .sort_index()
        )
        days = np.array(
            [(d - daily.index[0]).days for d in daily.index], dtype=float
        )
        vals = daily.to_numpy(dtype=float)
        tr = days < 20
        slope, icept = np.polyfit(days[tr], vals[tr], 1)
        err = (vals[~tr] - (icept + slope * days[~tr])) / 1_000_000
        mae, rmse = np.abs(err).mean(), np.sqrt((err**2).mean())
        g_mae, g_rmse = got[etype]
        assert g_mae == pytest.approx(mae, abs=1e-4)
        assert g_rmse == pytest.approx(rmse, abs=1e-4)
