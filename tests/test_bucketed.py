"""Bucketed-table co-location: a join of two tables bucketed on the
same key must plan WITHOUT a shuffle Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_energy_data_server_spark.sinks.bucketed import (
    plan_has_shuffle,
    read_table,
    write_bucketed,
)


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    # warehouse dir is a static conf — set session-wide in conftest
    spark.sql("CREATE DATABASE IF NOT EXISTS btest")
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    dims = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    write_bucketed(facts, "btest.fact_a", ["k"], 8, sort_cols=["k"])
    write_bucketed(dims, "btest.fact_b", ["k"], 8, sort_cols=["k"])
    yield "btest.fact_a", "btest.fact_b"
    spark.sql("DROP TABLE IF EXISTS btest.fact_a")
    spark.sql("DROP TABLE IF EXISTS btest.fact_b")


def test_bucketed_join_no_shuffle(spark, bucketed_pair):
    a, b = bucketed_pair
    # disable broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, a).join(read_table(spark, b), "k")
        assert not plan_has_shuffle(joined), "bucketed join must not shuffle"
        assert joined.count() == 10_000
        # sanity: the same join on unbucketed frames DOES shuffle
        fa = spark.range(10_000).select(F.col("id").alias("k"))
        fb = spark.range(10_000).select(F.col("id").alias("k"))
        assert plan_has_shuffle(fa.join(fb, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_groupby_no_shuffle(spark, bucketed_pair):
    a, _ = bucketed_pair
    agged = read_table(spark, a).groupBy("k").agg(F.sum("v").alias("s"))
    assert not plan_has_shuffle(agged)
    assert agged.count() == 10_000


def test_semdedup_pair_join_zero_shuffle_on_bucketed_layout(spark):
    """Substantiates the semdedup scale claim mechanically: with the
    corpus written bucketed BY cluster id, the within-cluster pair
    join plans with NO Exchange — candidate generation at 100 TB is
    co-partitioned by the layout, not a shuffle."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.similarity import (
        cosine_neardup_pairs,
        fixed_norm2,
        ivf_scores,
    )
    from open_energy_data_server_spark.sinks.bucketed import (
        plan_has_shuffle,
        read_table,
        write_bucketed,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in emb.filter("vec_id < 4").select("vec_id", "embedding").collect()
    ]
    assigned = emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding"),
        ivf_scores(F.col("embedding"), fixed_norm2(F.col("embedding")), cents)[0][
            "cid"
        ].cast("int").alias("cluster"),
    )
    # warehouse dir is a static conf — set session-wide in conftest
    spark.sql("CREATE DATABASE IF NOT EXISTS btest")
    write_bucketed(assigned, "btest.emb_by_cluster", ["cluster"], 4)
    try:
        corpus = read_table(spark, "btest.emb_by_cluster")
        pairs = cosine_neardup_pairs(
            corpus, "vid", "embedding", threshold=0.3, block_col="cluster"
        )
        assert not plan_has_shuffle(pairs), (
            "bucketed-by-cluster pair join must be exchange-free"
        )
        # and it still finds the same pairs as the unbucketed path
        plain = cosine_neardup_pairs(
            assigned, "vid", "embedding", threshold=0.3, block_col="cluster"
        )
        key = lambda r: (r["id_a"], r["id_b"])
        assert sorted(map(key, pairs.collect())) == sorted(map(key, plain.collect()))
    finally:
        spark.sql("DROP TABLE IF EXISTS btest.emb_by_cluster")
