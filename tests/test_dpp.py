"""Dynamic partition pruning (the other runtime prune beside the
Bloom join, tests/test_bloom_prune.py): a fact table partitioned on
p_date joined to a FILTERED dim must scan only the partitions the
dim's surviving keys name — the filter value is not a literal, so
static pruning can't do it; Spark injects a dynamicpruning subquery
on the fact scan at runtime. At 100 TB over a date-partitioned
hypertable this is the difference between scanning 30 files and
30,000."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_dynamic_partition_pruning_on_hypertable_layout(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    fact_path = str(tmp_path / "events_by_day")
    (
        ev.withColumn("p_date", F.to_date("ts"))
        .write.mode("overwrite")
        .partitionBy("p_date")
        .parquet(fact_path)
    )
    fact = spark.read.parquet(fact_path)
    # dim of days with an attribute filter — value list only known at
    # runtime, so only DYNAMIC pruning can cut the fact partitions
    dim = (
        ev.select(F.to_date("ts").alias("p_date"))
        .distinct()
        .withColumn("dow", F.dayofweek("p_date"))
    )
    dim.write.mode("overwrite").parquet(str(tmp_path / "dim_days"))
    dim = spark.read.parquet(str(tmp_path / "dim_days"))
    picked = dim.where(F.col("dow") == 2)  # Mondays
    joined = fact.join(picked, "p_date").groupBy("event_type").count()
    rows = {(r.event_type, r["count"]) for r in joined.collect()}

    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, "DPP subquery not injected on the fact scan"

    # semantics: identical to the unpartitioned-path join
    expect = {
        (r.event_type, r["count"])
        for r in (
            ev.withColumn("p_date", F.to_date("ts"))
            .join(picked, "p_date")
            .groupBy("event_type")
            .count()
            .collect()
        )
    }
    assert rows == expect and rows
