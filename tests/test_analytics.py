"""Unit tests for the round-5 analytics operators: deletion-
neighborhood fuzzy linkage, PageRank, bigram-LM scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_fuzzy_pairs_edit_distance_one(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd"), (3, "abcd"), (4, "xyz"), (5, "abc")],
        "id bigint, name string",
    )
    from open_energy_data_server_spark.operators.fuzzy import fuzzy_pairs

    rows = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in fuzzy_pairs(df, "id", "name").collect()
    }
    # substitution, insertion, exact duplicate — all found; xyz isolated
    assert rows == {
        (1, 2): 1,  # abc ~ abd (substitution)
        (1, 3): 1,  # abc ~ abcd (insertion)
        (2, 3): 1,  # abd ~ abcd (insertion)
        (1, 5): 0,  # exact duplicate
        (2, 5): 1,
        (3, 5): 1,
    }


def test_fuzzy_pairs_rejects_large_radius(spark):
    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    from open_energy_data_server_spark.operators.fuzzy import fuzzy_pairs

    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_pairs(df, "id", "name", max_dist=2)


def test_pagerank_path_graph(spark):
    """Hand-computed two rounds on the path 1–2–3 (deg 1,2,1)."""
    from open_energy_data_server_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(1, 2), (2, 3)], "a bigint, b bigint")
    r = {row["node"]: row["rank"] for row in pagerank(edges, "a", "b", iters=2).collect()}
    assert r[1] == pytest.approx(0.15 + 0.85 * (1.85 / 2), abs=1e-6)
    assert r[2] == pytest.approx(0.15 + 0.85 * (0.575 + 0.575), abs=1e-6)
    assert r[3] == r[1]


def test_pagerank_symmetric_pair_is_stationary(spark):
    from open_energy_data_server_spark.operators.graph import pagerank

    edges = spark.createDataFrame([(7, 8)], "a bigint, b bigint")
    r = {row["node"]: row["rank"] for row in pagerank(edges, "a", "b", iters=3).collect()}
    assert r[7] == pytest.approx(1.0, abs=1e-6)
    assert r[8] == pytest.approx(1.0, abs=1e-6)


def test_bigram_lm_scores(spark):
    from open_energy_data_server_spark.operators.textops import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "solo")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["lm_score"]) for r in
           bigram_lm_scores(docs, "doc_id", "text").collect()}
    # c(a,b)=c(a,c)=1, c(a·)=2 → both docs score 0.5; "solo" has no bigrams
    assert out[1] == (1, pytest.approx(0.5, abs=1e-6))
    assert out[2] == (1, pytest.approx(0.5, abs=1e-6))
    assert 3 not in out


def test_load_duration_curve_monotone(spark):
    """exceed_frac is non-decreasing as load level falls, ends at 1."""
    import __spark_entry__ as e

    df = e.queries()["q_load_duration_curve"](spark, "/root/testdata/sf0.001")
    rows = df.filter(F.col("event_type") == "click").orderBy(
        F.col("value").desc()
    ).collect()
    fracs = [r["exceed_frac"] for r in rows]
    assert fracs == sorted(fracs)
    assert fracs[-1] == pytest.approx(1.0)
    # the lowest level's cumulative count covers every event of the type
    assert rows[-1]["cum_hours"] >= len(rows)


def test_persist_registry_caps_and_releases(spark):
    """Operator-internal persists register in the capped FIFO; evicted
    / released frames recompute correctly (plans stay valid)."""
    from open_energy_data_server_spark.operators import _cache
    from open_energy_data_server_spark.operators.fuzzy import fuzzy_pairs

    _cache.release_all()
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abd")], "id bigint, name string"
    )
    pairs = fuzzy_pairs(df, "id", "name")
    assert pairs.count() == 1
    assert len(_cache._PERSISTED) >= 1
    n = _cache.release_all()
    assert n >= 1 and len(_cache._PERSISTED) == 0
    # the returned plan still executes after release (recomputes)
    assert pairs.count() == 1


def test_ewma_matches_bruteforce_fold(spark):
    """q_ewma's 8-term integer-weight chain == an explicit per-series
    python fold over sf0.001 events."""
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in QUERIES["q_ewma"](spark, sf).collect()
    }
    rows = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    series = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        series.setdefault(r["user_id"], []).append((r["event_id"], r["value"]))
    def half_round(z):  # ROUND half away from zero, as both engines
        import math
        return int(math.copysign(math.floor(abs(z) + 0.5), z))
    checked = 0
    for uid, seq in series.items():
        for t in range(len(seq)):
            num = den = 0
            for j in range(8):
                if t - j < 0:
                    break
                num += (128 >> j) * half_round(seq[t - j][1] * 1_000_000)
                den += 128 >> j
            expect = (num / den) / 1e6
            assert got[(uid, seq[t][0])] == expect
            checked += 1
    assert checked == len(rows)


def test_gini_matches_bruteforce(spark):
    """q_gini_coefficient == the closed form computed in python ints
    over sf0.001 orders; bounds sanity 0 <= G < 1."""
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    row = QUERIES["q_gini_coefficient"](spark, sf).collect()[0]
    orders = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice").collect()
    import math
    per = {}
    for r in orders:
        per[r["o_custkey"]] = per.get(r["o_custkey"], 0) + int(
            math.copysign(math.floor(abs(r["o_totalprice"] * 100) + 0.5), 1)
        )
    xs = sorted(per.items(), key=lambda kv: (kv[1], kv[0]))
    n, tot = len(xs), sum(v for _, v in xs)
    num = sum((2 * (i + 1) - n - 1) * v for i, (_, v) in enumerate(xs))
    assert row["n_customers"] == n
    assert row["gini"] == (num / tot) / n
    assert 0.0 <= row["gini"] < 1.0


def test_runs_detection_matches_bruteforce(spark):
    """q_runs_detection episodes == a per-series python scan over
    sf0.001 events (same threshold/min-length)."""
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["user_id"], r["run_start"], r["run_end"], r["n_samples"], r["peak"])
        for r in QUERIES["q_runs_detection"](spark, sf).collect()
    )
    rows = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    series = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        series.setdefault(r["user_id"], []).append(r)
    expect = []
    for uid, seq in series.items():
        run = []
        for r in seq + [None]:
            if r is not None and r["value"] > 100.0:
                run.append(r)
                continue
            if len(run) >= 2:
                expect.append(
                    (
                        uid,
                        run[0]["ts"].strftime("%Y-%m-%d %H:%M:%S"),
                        run[-1]["ts"].strftime("%Y-%m-%d %H:%M:%S"),
                        len(run),
                        max(x["value"] for x in run),
                    )
                )
            run = []
    assert got == sorted(expect) and len(got) > 0


def test_vocab_overlap_matches_bruteforce(spark):
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    got = {
        (r["src_a"], r["src_b"]): (r["n_common"], r["overlap_coef"], r["jaccard"])
        for r in QUERIES["q_vocab_overlap"](spark, sf).collect()
    }
    docs = load_table(spark, sf, "documents").select("source", "text").collect()
    import re
    vocab = {}
    for r in docs:
        # ASCII whitespace only — Java/RE2 \s is not Unicode-aware,
        # unlike Python's
        vocab.setdefault(r["source"], set()).update(
            re.split(r"[ \t\n\x0b\f\r]+", r["text"].strip().lower())
        )
    expect = {}
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                continue
            expect[(a, b)] = (  # srcs sorted => a < b always
                inter,
                inter / min(len(vocab[a]), len(vocab[b])),
                inter / len(vocab[a] | vocab[b]),
            )
    assert set(got) == set(expect)
    for k in got:
        assert got[k] == expect[k], k


def test_fuzzy_variant_self_join_is_shuffled_hash(spark):
    """Round-11 plan pin: the variant self-join must be a
    ShuffledHashJoin, not a broadcast — the cached variant stream's
    pre-materialization size estimate tricks the planner into
    broadcasting ~|names|·(L+1) rows, whose serial hash-relation build
    per execution measured 2.7× slower than SHJ (operators/fuzzy.py
    rationale)."""
    from open_energy_data_server_spark.queries import QUERIES

    df = QUERIES["q_fuzzy_dedup_names"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, "variant self-join lost the SHJ hint"
