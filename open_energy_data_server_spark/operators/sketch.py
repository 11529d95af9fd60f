"""Distinct-count sketching (KMV — k minimum values).

Spark's built-in ``approx_count_distinct`` is HyperLogLog++, whose
register layout no other engine replays — useless under a cross-engine
value-hash gate. KMV (Bar-Yossef et al., RANDOM'02) gives the same
O(k) summary but is a pure function of the value *hashes*: keep the k
smallest distinct 60-bit hashes; if fewer than k exist the count is
exact, else estimate D ≈ (k−1) · 2⁶⁰ / h₍ₖ₎. With the engine's shared
md5-based ``hash60`` both Spark and the DuckDB oracle produce the
IDENTICAL estimate, so the sketch sits behind the same conformance
gate as every exact operator.

Scale shape: the k-smallest selection is a per-group top-k — partial
per partition (each partition keeps its own k smallest), then a merge
of k-sized states, the same mergeability story as the production
sketch services built on KMV/theta sketches. The implementation
expresses it as distinct → windowed rank ≤ k, which Spark executes
with partial aggregation on both the distinct and the top-k."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.textops import hash60

TWO_60 = float(1 << 60)


def kmv_distinct(
    df: DataFrame, key_cols: list[str], value_col: str, k: int = 128
) -> DataFrame:
    """(key_cols..., n_exactish, est_distinct) per group.

    ``est_distinct`` is exact when the group has < k distinct values
    (the sketch saw everything), else the KMV estimate. Deterministic:
    same rows → same estimate, engine-independent."""
    hashed = df.select(*key_cols, hash60(F.col(value_col).cast("string")).alias("h")).distinct()
    w = Window.partitionBy(*key_cols).orderBy("h")
    topk = hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    return topk.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("m"),
        F.max("h").alias("hk"),
    ).select(
        *key_cols,
        F.col("m").cast("bigint").alias("n_seen"),
        F.when(F.col("m") < k, F.col("m").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(TWO_60) / F.col("hk").cast("double"))
        .alias("est_distinct"),
    )


def _cms_buckets(key_col: str, d: int, w: int):
    """The (j, bucket) probe array shared by build and estimate — ONE
    definition so the hash family can never drift between the counters
    a sketch was built with and the buckets an estimate probes."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.pmod(
                    hash60(F.concat(F.lit(f"{j}:"), F.col(key_col).cast("string"))),
                    F.lit(int(w)),
                )
                .cast("int")
                .alias("bucket"),
            )
            for j in range(d)
        ]
    )


def cms_counters(
    df: DataFrame, key_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) counter table:
    ``d`` hash rows × ``w`` buckets, counting every occurrence of
    ``key_col``. Like the KMV sketch, the hash family is the engine's
    md5-based ``hash60`` (row j hashes ``"j:" || key``), so a DuckDB
    twin builds the IDENTICAL counters — integer arithmetic end to
    end, no estimate drift between engines.

    Scale shape: the sketch is a d·w-row table regardless of stream
    size — one map-side-combined (j, bucket) hash-agg over the
    exploded stream, mergeable across partitions/days by summing
    counters. The point-query path (``cms_estimate``) broadcasts it."""
    return (
        df.select(F.explode(_cms_buckets(key_col, d, w)).alias("e"))
        .select(F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame, counters: DataFrame, key_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """Point queries against a CMS counter table: est(x) = min over
    the d rows of the bucket counter x hashes to — an overestimate
    never below the true count. ``counters`` is d·w rows, so the join
    is a broadcast; the min is a d-row per-key fold."""
    long = keys.select(key_col, F.explode(_cms_buckets(key_col, d, w)).alias("e")).select(
        key_col, F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket")
    )
    return (
        long.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_count"))
    )
