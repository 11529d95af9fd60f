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
