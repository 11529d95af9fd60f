"""Unit tests for operators/ranking.py — the production (log-idf)
variants and structural invariants; the exact conformance variants are
covered by test_oracle_parity via queries/search_rank.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.ranking import (
    bm25_topk,
    doc_terms,
    familiarity_buckets,
    tfidf_topk,
)


def _docs(spark):
    rows = [
        (1, "spark spark spark join"),
        (2, "join hash window stream join hash"),
        (3, "alpha beta gamma delta epsilon zeta"),
        (4, "spark  Spark\tSPARK"),  # case/whitespace normalization
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_doc_terms_normalizes_and_counts(spark):
    t = {
        (r["doc"], r["term"]): (r["tf"], r["dl"])
        for r in doc_terms(_docs(spark), "doc_id", "text").collect()
    }
    assert t[(4, "spark")] == (3, 3)  # lowercased, multi-space split
    assert t[(1, "spark")] == (3, 4)
    assert t[(2, "join")] == (2, 6)


def test_tfidf_log_variant_ranks_rare_terms_first(spark):
    out = tfidf_topk(_docs(spark), "doc_id", "text", k=2, exact=False)
    rows = {(r["doc_id"], r["rank"]): r["term"] for r in out.collect()}
    # doc 1: 'spark' (tf 3/4, df 2) outranks 'join' (tf 1/4, df 2)
    assert rows[(1, 1)] == "spark"
    # every doc emits at most k rows, ranks are 1..k contiguous
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    )
    for r in per_doc.collect():
        assert r["n"] == r["mx"] <= 2


def test_bm25_log_variant_prefers_matching_docs(spark):
    out = bm25_topk(
        _docs(spark), "doc_id", "text", ["join", "hash"], k=10, exact=False
    ).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # doc 2 has both terms twice; doc 1 has one 'join'; doc 3/4 none
    assert ranked[0] == 2
    assert set(ranked) == {1, 2}


def test_familiarity_bucket_head_is_common_language(spark):
    rows = [(i, "common words common words") for i in range(1, 7)] + [
        (7, "xylophone quark zeppelin"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["bucket"] for r in
           familiarity_buckets(docs, "doc_id", "text", n_buckets=3).collect()}
    # the outlier-language doc lands in the tail bucket
    assert out[7] == 3
    assert min(out.values()) == 1


def test_linear_classifier_explicit_weights_and_threshold(spark):
    from open_energy_data_server_spark.operators.ranking import (
        linear_text_classifier,
    )

    docs = spark.createDataFrame(
        [(1, "good good good"), (2, "bad bad"), (3, "")],
        "doc_id bigint, text string",
    )
    # weights: everything 0 except the buckets 'good'/'bad' hash into
    from open_energy_data_server_spark.operators.textops import hash60
    from pyspark.sql import functions as F

    fids = {
        r["t"]: r["f"]
        for r in spark.createDataFrame([("good",), ("bad",)], "t string")
        .select("t", (hash60(F.col("t")) % 16).alias("f"))
        .collect()
    }
    w = [0.0] * 16
    w[fids["good"]] = 1.0
    w[fids["bad"]] = -1.0
    out = {
        r["doc_id"]: r
        for r in linear_text_classifier(
            docs, "doc_id", "text", n_features=16, weights=w, threshold=0.5
        ).collect()
    }
    assert out[1]["score"] == 1.0 and out[1]["keep"]
    assert out[2]["score"] == -1.0 and not out[2]["keep"]
    assert 3 not in out  # no tokens -> no row (matches the oracle)


def test_linear_classifier_rejects_wrong_weight_count(spark):
    import pytest

    from open_energy_data_server_spark.operators.ranking import (
        linear_text_classifier,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="weights"):
        linear_text_classifier(docs, "doc_id", "text", n_features=8, weights=[0.1])


def test_global_rank_matches_single_partition_order(spark):
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.operators.ranking import global_rank

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(500)], "id bigint, v double"
    )
    ranked, total = global_rank(df, [F.col("v").desc(), F.col("id")], out_col="r", parts=8)
    assert total == 500
    rows = ranked.orderBy("r").collect()
    expected = sorted(((r["v"], r["id"]) for r in rows), key=lambda t: (-t[0], t[1]))
    got = [(r["v"], r["id"]) for r in rows]
    assert got == expected
    assert [r["r"] for r in rows] == list(range(1, 501))


def test_ntile_formula_matches_sql_ntile(spark):
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.operators.ranking import ntile_from_rank

    # 10 rows, 3 buckets: NTILE gives sizes 4,3,3
    for total, n in ((10, 3), (5, 7), (6, 3), (1, 4)):
        got = [
            spark.range(1)
            .select(ntile_from_rank(F.lit(r), total, n).alias("b"))
            .collect()[0]["b"]
            for r in range(1, total + 1)
        ]
        want = [
            r["b"]
            for r in spark.sql(
                f"SELECT ntile({n}) OVER (ORDER BY id) AS b FROM range({total})"
            ).collect()
        ]
        assert got == want, (total, n, got, want)


def test_global_cumsum_matches_single_partition_prefix_sum(spark):
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.operators.ranking import global_cumsum

    # integral values with duplicates in the order key → the id
    # tiebreak must make the prefix sum independent of partitioning
    rows = [(i, int((i * 37) % 13) * 1000) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, v bigint")
    cum, total = global_cumsum(
        df, [F.col("v").desc(), F.col("id")], "v", out_col="c", parts=8
    )
    assert total == sum(v for _, v in rows)
    got = {r["id"]: r["c"] for r in cum.collect()}
    acc = 0
    for _id, v in sorted(rows, key=lambda t: (-t[1], t[0])):
        acc += v
        assert got[_id] == acc


def test_global_cumsum_single_row_and_empty(spark):
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.operators.ranking import global_cumsum

    one = spark.createDataFrame([(1, 7)], "id bigint, v bigint")
    cum, total = global_cumsum(one, [F.col("v"), F.col("id")], "v", parts=4)
    assert total == 7 and cum.collect()[0]["__cum"] == 7

    empty = one.filter(F.col("id") < 0)
    cum0, total0 = global_cumsum(empty, [F.col("v"), F.col("id")], "v", parts=4)
    assert total0 == 0 and cum0.count() == 0


def test_global_rank_correct_after_cache_eviction(spark):
    """Eviction of the persisted range frame between plan construction
    and execution must not desync ranks from offsets (the offsets are
    in-plan, sharing the rank pass's exchange — ADVICE round 5)."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.operators import _cache
    from open_energy_data_server_spark.operators.ranking import (
        global_cumsum,
        global_rank,
    )

    df = spark.createDataFrame(
        [(i, float((i * 37) % 101)) for i in range(500)], "id bigint, v double"
    )
    ranked, total = global_rank(df, [F.col("v").desc(), F.col("id")], out_col="r", parts=8)
    cumdf = spark.createDataFrame(
        [(i, int((i * 37) % 13) * 1000) for i in range(500)], "id bigint, v bigint"
    )
    cum, _ = global_cumsum(
        cumdf, [F.col("v").desc(), F.col("id")], "v", out_col="c", parts=8
    )
    _cache.release_all()  # evict BEFORE either returned plan executes

    rows = ranked.orderBy("r").collect()
    assert [r["r"] for r in rows] == list(range(1, total + 1))
    expected = sorted(((r["v"], r["id"]) for r in rows), key=lambda t: (-t[0], t[1]))
    assert [(r["v"], r["id"]) for r in rows] == expected

    got = {r["id"]: r["c"] for r in cum.collect()}
    acc = 0
    for _id, v in sorted(
        [(i, int((i * 37) % 13) * 1000) for i in range(500)], key=lambda t: (-t[1], t[0])
    ):
        acc += v
        assert got[_id] == acc
