"""Runtime Bloom-filter join pruning (the 100 TB selective-dim-join
technique): Spark injects a bloom_filter_agg subquery on the dim side
and a might_contain filter on the fact scan, dropping non-matching
fact rows BEFORE the shuffle ships them. This pins that the engine's
shape (shuffle join over a selective dim) actually triggers the
injection, and that pruning never changes the result."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"

_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # force the fact side to qualify regardless of local file sizes
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # a broadcast join would bypass the runtime filter (broadcast IS
    # the prune there); force the shuffle-join shape under test
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _selective_dim_join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    dim = part.where(F.col("p_size") <= 5).select("p_partkey")
    return (
        li.join(dim, li.l_partkey == dim.p_partkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias(
                "rev_c"
            ),
        )
    )


def test_runtime_bloom_filter_injected_and_exact(spark):
    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    baseline = {
        tuple(r) for r in _selective_dim_join(spark).collect()
    }  # plain plan, no forced confs
    try:
        for k, v in _BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = _selective_dim_join(spark)
        rows = {tuple(r) for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "dim-side bloom build not injected"
        assert "might_contain" in plan, "fact-side bloom probe not injected"
        # the probe must sit on the fact (lineitem) scan side
        probe_lines = [ln for ln in plan.splitlines() if "might_contain" in ln]
        assert any("l_partkey" in ln for ln in probe_lines)
        # pruning is a plan optimization, never a semantics change
        assert rows == baseline
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
