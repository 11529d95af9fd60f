"""Structured Streaming surface (SURVEY §2.9 / F12): windowed
aggregations with watermarks and custom stateful operators over the
``events`` stream shape."""

from __future__ import annotations

import os


def size_state_partitions(
    spark,
    rows_per_trigger: int,
    target_rows_per_partition: int = 1000,
) -> int:
    """Set ``spark.sql.shuffle.partitions`` (which fixes the STATE
    STORE partition count at stream start — it cannot change for the
    life of a checkpoint) from expected per-trigger volume.

    Guide §2/§5 applied to streaming: every stateful operator commits
    one state-store instance per partition PER MICRO-BATCH, so
    partition count is a per-batch fixed cost (~10-30 ms each,
    HDFS-backed provider). Defaulting it to the core count (the batch
    default) makes small/medium triggers commit-bound: the round-11
    streambench measured 2.0k → 5.7k rows/s on the latency-bound
    curation config just by sizing partitions to batch volume (32 → 8
    for 5k-row triggers). For large production triggers the volume
    term dominates and this returns the session's parallelism cap —
    sizing never LOWERS a genuinely loaded stream's parallelism.

    Env override ``SPARK_OEDS_STREAM_STATE_PARTITIONS`` pins an
    explicit count (deployments that know their key cardinality).
    Returns the partition count it set."""
    env = os.environ.get("SPARK_OEDS_STREAM_STATE_PARTITIONS")
    if env:
        n = max(1, int(env))
    else:
        par = max(spark.sparkContext.defaultParallelism, 1)
        n = max(2, min(par, rows_per_trigger // max(target_rows_per_partition, 1)))
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    return n
