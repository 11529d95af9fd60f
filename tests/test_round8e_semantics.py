"""Semantic checks for the round-8 batch-4 queries: an independent
numpy/pandas/urllib re-derivation of each operator's DEFINITION at
sf0.001 (the DuckDB parity gate proves engine-equivalence; this
proves both engines compute what the textbook/RFC defines)."""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit

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


@pytest.fixture(scope="module")
def lineitem_pdf():
    pdf = pd.read_parquet(f"{SF}/lineitem.parquet")
    pdf["l_shipdate"] = pd.to_datetime(pdf["l_shipdate"])
    return pdf


def test_spearman_matches_pandas(spark, events_pdf):
    row = QUERIES["q_spearman_daily"](spark, SF).collect()[0]
    days = pd.date_range(
        events_pdf["ts"].min().normalize(),
        events_pdf["ts"].max().normalize(),
        freq="D",
    )

    def daily(etype):
        g = events_pdf[events_pdf["event_type"] == etype]
        sv = (g["value"] * 1_000_000).round().astype("int64")
        return (
            sv.groupby(g["ts"].dt.normalize())
            .sum()
            .reindex(days, fill_value=0)
        )

    a, b = daily("click"), daily("purchase")
    assert row.n_days == len(days)

    def avg_rank(v):
        # textbook average ranks with ties (scipy.stats.rankdata
        # equivalent; scipy isn't in this environment)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(v.size, dtype=float)
        i = 0
        sv = v[order]
        while i < v.size:
            j = i
            while j + 1 < v.size and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    ra = avg_rank(a.to_numpy())
    rb = avg_rank(b.to_numpy())
    rho = np.corrcoef(ra, rb)[0, 1]
    assert row.spearman_rho == pytest.approx(rho, abs=1e-6)


def test_merit_order_matches_numpy(spark, lineitem_pdf):
    got = {
        r.day: (r.n_offers, r.total_capacity, r.marginal_price,
                r.dispatched_capacity)
        for r in QUERIES["q_merit_order"](spark, SF).collect()
    }
    li = lineitem_pdf.assign(
        day=lineitem_pdf["l_shipdate"].dt.strftime("%Y-%m-%d"),
        unit_price=lineitem_pdf["l_extendedprice"] / lineitem_pdf["l_quantity"],
        qty=lineitem_pdf["l_quantity"].astype("int64"),
    )
    assert set(got) == set(li["day"].unique())
    for day, g in li.groupby("day"):
        g = g.sort_values(["unit_price", "l_orderkey", "l_linenumber"])
        cum = g["qty"].cumsum().to_numpy()
        tot = int(g["qty"].sum())
        # first offer whose cumulative capacity covers half the stack
        i = int(np.argmax(2 * cum >= tot))
        n_offers, total_capacity, marginal_price, dispatched = got[day]
        assert n_offers == len(g)
        assert total_capacity == tot
        assert dispatched == int(cum[i])
        assert marginal_price == pytest.approx(
            float(g["unit_price"].iloc[i]), abs=1e-6
        )


def test_trimmed_winsorized_match_numpy(spark, events_pdf):
    got = {
        r.event_type: (r.n, r.k_per_tail, r.trimmed_mean, r.winsorized_mean)
        for r in QUERIES["q_trimmed_mean"](spark, SF).collect()
    }
    for etype, g in events_pdf.groupby("event_type"):
        # the engine rounds each sample at 6 decimals before summing
        v = np.sort((g["value"] * 1_000_000).round().to_numpy()) / 1_000_000
        n = v.size
        k = n // 10
        trimmed = v[k : n - k].mean()
        winsor = np.clip(v, v[k], v[n - k - 1]).mean()
        gn, gk, gt, gw = got[etype]
        assert (gn, gk) == (n, k)
        assert gt == pytest.approx(trimmed, abs=1e-6)
        assert gw == pytest.approx(winsor, abs=1e-6)


def test_first_touch_matches_pandas(spark, events_pdf):
    got = {
        r.channel: (r.n_users, r.n_converters, r.n_purchases,
                    r.attributed_revenue)
        for r in QUERIES["q_first_touch_attribution"](spark, SF).collect()
    }
    firsts = (
        events_pdf.sort_values(["ts", "event_id"])
        .groupby("user_id")
        .first()["event_type"]
        .rename("channel")
    )
    purch = events_pdf[events_pdf["event_type"] == "purchase"]
    sv = (purch["value"] * 1_000_000).round().astype("int64")
    rev = sv.groupby(purch["user_id"]).agg(["sum", "size"])
    joined = firsts.to_frame().join(rev, how="left")
    for channel, g in joined.groupby("channel"):
        n_users = len(g)
        n_conv = int(g["sum"].notna().sum())
        n_purch = int(g["size"].fillna(0).sum())
        revenue = g["sum"].fillna(0).sum() / 1_000_000
        gu, gc, gp, gr = got[channel]
        assert (gu, gc, gp) == (n_users, n_conv, n_purch)
        assert gr == pytest.approx(revenue, abs=1e-6)


def _canon_urllib(url: str) -> str:
    """RFC-3986-based canonicalizer: the independent implementation of
    the contract q_url_canonicalize's regex chain promises."""
    parts = urlsplit(url)
    host = parts.netloc.lower()
    # strip the port only when it is the scheme's OWN default
    default = {"https": ":443", "http": ":80"}.get(parts.scheme.lower())
    if default and host.endswith(default):
        host = host[: -len(default)]
    params = [
        (k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not k.startswith("utm_")
    ]
    path = parts.path.rstrip("/") or ""
    query = urlencode(params)
    return (
        f"{parts.scheme.lower()}://{host}{path}"
        + (f"?{query}" if query else "")
    )


def test_url_canonicalize_matches_urllib(spark):
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def raw(row):
        v = (int(row.doc_id) // 50) % 4
        src, i = row.source, int(row.doc_id) % 50
        if v == 0:
            return (f"https://WWW.{src.upper()}.example.com:443"
                    f"/corpus/{src}/doc?utm_source=feed&id={i}#top")
        if v == 1:
            return (f"https://www.{src}.Example.Com/corpus/{src}/doc"
                    f"?id={i}&utm_campaign=x&utm_medium=email")
        if v == 2:
            return f"https://www.{src}.example.com/corpus/{src}/doc/?id={i}"
        return (f"https://www.{src}.example.com:443/corpus/{src}/doc"
                f"?id={i}#section-2")

    raws = docs.apply(raw, axis=1)
    expected = (
        pd.DataFrame({"canonical": raws.map(_canon_urllib), "raw": raws})
        .groupby("canonical")
        .agg(n_docs=("raw", "size"), n_raw_variants=("raw", "nunique"))
    )
    got = {
        r.canonical_url: (r.n_docs, r.n_raw_variants)
        for r in QUERIES["q_url_canonicalize"](spark, SF).collect()
    }
    assert got == {
        url: (int(r.n_docs), int(r.n_raw_variants))
        for url, r in expected.iterrows()
    }
    # the synthesis produced genuine collapses (the operator did work)
    assert any(v[1] > 1 for v in got.values())


def test_volume_price_curve_matches_numpy(spark, lineitem_pdf):
    got = {
        r.qty_bin: (r.n, r.mean_unit_price, r.stddev_unit_price)
        for r in QUERIES["q_volume_price_curve"](spark, SF).collect()
    }
    p = lineitem_pdf["l_extendedprice"] / lineitem_pdf["l_quantity"]
    for qty, idx in p.groupby(
        lineitem_pdf["l_quantity"].astype("int64")
    ).groups.items():
        v = p.loc[idx].to_numpy()
        n, mean, std = got[qty]
        assert n == v.size
        assert mean == pytest.approx(v.mean(), abs=1e-5)
        assert std == pytest.approx(v.std(ddof=0), abs=1e-4)


def test_canonicalizer_edge_cases(spark):
    """Review-finding pins: params merely CONTAINING 'utm_' survive,
    non-default ports survive (http:443 is a DIFFERENT origin), long
    tracking runs clear, and the urllib reference agrees on each."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.queries.round8e import _canon_spark

    cases = [
        ("https://H/p?myutm_x=1&id=2", "https://h/p?myutm_x=1&id=2"),
        ("http://api.Example.com:443/v1", "http://api.example.com:443/v1"),
        ("http://api.example.com:80/v1", "http://api.example.com/v1"),
        ("https://h/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4&id=5",
         "https://h/p?id=5"),
        ("https://h/p?utm_a=1&utm_b=2&utm_c=3&utm_d=4", "https://h/p"),
        ("https://h:443/p/?id=1#f", "https://h/p?id=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["raw"])
    got = [
        r.c for r in df.select(_canon_spark(F.col("raw")).alias("c")).collect()
    ]
    assert got == [want for _, want in cases]
    for (raw, want) in cases:
        assert _canon_urllib(raw) == want


def test_canonicalizer_randomized_sweep(spark):
    """Randomized contract sweep: 200 seeded URLs across the generator
    space (mixed-case hosts, default/odd ports, utm_* and NEAR-utm
    param names in any position, slash runs, fragments) — the Spark
    regex chain must agree with the urllib reference on every one.
    Generator stays inside the canonicalizer's documented domain:
    percent-free, '+'-free, k=v-only queries (urlencode would re-code
    escapes the rewrite chain deliberately leaves untouched)."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.queries.round8e import _canon_spark

    rng = np.random.default_rng(88)
    hosts = ["Api.Example.COM", "www.test.de", "H.io"]
    ports = ["", ":443", ":80", ":8080"]
    keys = ["utm_source", "utm_campaign", "utm_medium", "myutm_x",
            "id", "q", "xutm_y"]
    urls = []
    for _ in range(200):
        scheme = ["http", "https"][rng.integers(2)]
        host = hosts[rng.integers(len(hosts))]
        port = ports[rng.integers(len(ports))]
        segs = ["Seg%d" % rng.integers(10) for _ in range(rng.integers(1, 4))]
        path = "/" + "/".join(segs) + "/" * rng.integers(0, 3)
        n_params = rng.integers(0, 5)
        chosen = list(rng.choice(keys, size=n_params, replace=False))
        query = "&".join(f"{k}=v{rng.integers(100)}" for k in chosen)
        frag = ["", "#frag"][rng.integers(2)]
        urls.append(
            f"{scheme}://{host}{port}{path}"
            + (f"?{query}" if query else "")
            + frag
        )
    df = spark.createDataFrame([(u,) for u in urls], ["raw"])
    got = [
        r.c for r in df.select(_canon_spark(F.col("raw")).alias("c")).collect()
    ]
    want = [_canon_urllib(u) for u in urls]
    mismatches = [(u, g, w) for u, g, w in zip(urls, got, want) if g != w]
    assert not mismatches, mismatches[:5]
