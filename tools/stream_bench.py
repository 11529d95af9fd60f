"""Streaming curation-pipeline throughput bench (round-10 verdict ask
#4): sustained rows/s, batch latency, and state-store size under load
for the production ingest shape

    quality gate → content dedup → minhash dedup → parquet sink

The correctness story (eviction, crash-replay, exactly-once ledger)
is pinned by tests/test_streaming.py; this publishes the THROUGHPUT
evidence: the sf0.1 documents corpus replayed R× as a 20-micro-batch
file stream with event time advancing one minute per batch, exact
duplicates injected across replicas (every 3rd doc keeps its verbatim
text → the content stage does real dropping), and a watermark short
enough that state eviction is visible INSIDE the run (peak vs final
state rows).

Emits ONE JSON line and writes STREAMBENCH_STREAMING.json:
  rows_in, rows_out, wall_sec, rows_per_sec, batches,
  batch_ms {mean, p50, max}, state_rows {peak, final},
  per-operator state rows at peak.

Both dedup operators are pure JVM projections (md5 / shingle
transform / dropDuplicatesWithinWatermark) — no Python stage — so
this measures the engine, not Arrow transfer.

Usage: PYTHONPATH=. python tools/stream_bench.py [replicas] [files_per_trigger]

Two published configs: files_per_trigger=1 (20 micro-batches — the
LATENCY-bound shape: per-batch state/scheduler overhead visible) and
files_per_trigger=5 (4 big micro-batches — the THROUGHPUT-bound shape
a production trigger interval would run). rows/s scales with batch
size because the per-row cost is JVM projection work, not state
round-trips.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _stats(progress: list, rows_in: int, wall: float) -> dict:
    """Shared batch-latency / state-row digest of a query's progress."""
    batch_ms = [
        p["durationMs"].get("triggerExecution", 0)
        for p in progress
        if p.get("numInputRows", 0) > 0
    ]
    state_series = [
        sum(op.get("numRowsTotal", 0) for op in p.get("stateOperators", []))
        for p in progress
    ]
    peak_idx = (
        max(range(len(state_series)), key=state_series.__getitem__)
        if state_series
        else 0
    )
    per_op_peak = [
        op.get("numRowsTotal", 0)
        for op in (progress[peak_idx].get("stateOperators", []) if progress else [])
    ]
    batch_sorted = sorted(batch_ms)
    return {
        "value": round(rows_in / wall, 1),
        "unit": "rows/s",
        "rows_in": rows_in,
        "wall_sec": round(wall, 3),
        "batches": len(batch_ms),
        "batch_ms": {
            "mean": round(sum(batch_ms) / max(len(batch_ms), 1), 1),
            "p50": batch_sorted[len(batch_sorted) // 2] if batch_sorted else 0,
            "max": max(batch_ms) if batch_ms else 0,
        },
        "state_rows": {
            "peak": max(state_series) if state_series else 0,
            "final": state_series[-1] if state_series else 0,
            "per_operator_at_peak": per_op_peak,
        },
    }


def _publish(record: dict) -> None:
    """Append/replace this config's entry in STREAMBENCH.json."""
    print(json.dumps(record))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STREAMBENCH.json",
    )
    try:
        with open(path) as fh:
            prior = json.load(fh)
        configs = prior.get("configs", [prior] if "metric" in prior else [])
    except (OSError, ValueError):
        configs = []
    key = (
        record["metric"],
        record.get("replicas"),
        record.get("files_per_trigger", 1),
    )
    configs = [
        c
        for c in configs
        if (
            c.get("metric"),
            c.get("replicas"),
            c.get("files_per_trigger", 1),
        )
        != key
    ] + [record]
    with open(path, "w") as fh:
        json.dump({"configs": configs}, fh, indent=1)


def run_cdc(n_batches: int, files_per_trigger: int) -> None:
    """TWS-under-load config: the sf0.1 events table replayed as a CDC
    change stream (op from event_type: signup=I, error=D, else U)
    through ``stream_cdc_apply`` — transformWithStateInPandas with one
    ValueState row per live user + tombstone-GC timers. Publishes
    rows/s, batch latency, and live-key state rows."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from open_energy_data_server_spark import get_spark
    from open_energy_data_server_spark.operators.cdc import (
        cdc_op_from_event_type,
    )
    from open_energy_data_server_spark.streaming import size_state_partitions
    from open_energy_data_server_spark.streaming.cdc import stream_cdc_apply

    spark = get_spark(app_name="spark-oeds-streambench-cdc")
    work = tempfile.mkdtemp(prefix="streambench-cdc-")
    src, out, ckpt = f"{work}/src", f"{work}/out", f"{work}/ckpt"

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("seq"),
            cdc_op_from_event_type("event_type").alias("op"),
            "value",
        )
    )
    rows_in = ev.count()
    # ts-ordered N-way split → event time advances monotonically
    # across micro-batches, so the watermark moves and GC timers fire
    ev = ev.withColumn(
        "_b",
        F.ntile(n_batches).over(Window.orderBy("ts")),
    )
    for b in range(1, n_batches + 1):
        ev.where(F.col("_b") == b).drop("_b").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(0.05)

    stream = (
        spark.readStream.schema(
            "user_id long, ts timestamp, seq long, op string, value double"
        )
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    # state partitions sized to per-trigger volume, not core count
    # (guide §2/§5; see streaming.size_state_partitions rationale)
    n_state = size_state_partitions(
        spark, rows_in * files_per_trigger // n_batches
    )
    t_start = time.perf_counter()
    q = (
        stream_cdc_apply(
            stream,
            ("user_id",),
            "ts",
            "seq",
            "op",
            watermark="30 minutes",
            tombstone_ttl="2 hours",
        )
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.perf_counter() - t_start
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()
    record = {
        "metric": "stream_cdc_tws_rows_per_sec",
        **_stats(progress, rows_in, wall),
        "rows_out": spark.read.parquet(out).count(),
        "replicas": n_batches,
        "files_per_trigger": files_per_trigger,
        "state_partitions": n_state,
        "sf_dir": sf_dir,
    }
    _publish(record)
    shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "cdc":
        run_cdc(
            int(sys.argv[2]) if len(sys.argv) > 2 else 20,
            int(sys.argv[3]) if len(sys.argv) > 3 else 1,
        )
        return
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    files_per_trigger = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from open_energy_data_server_spark import get_spark
    from open_energy_data_server_spark.streaming import size_state_partitions
    from open_energy_data_server_spark.streaming.dedup import (
        stream_content_dedup,
        stream_minhash_dedup,
    )

    spark = get_spark(app_name="spark-oeds-streambench")
    work = tempfile.mkdtemp(prefix="streambench-")
    src = f"{work}/src"
    out = f"{work}/out"
    ckpt = f"{work}/ckpt"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base_n = docs.count()

    # One file per replica, mtime-ordered so maxFilesPerTrigger=1
    # replays them as micro-batches with event time advancing 1 min
    # per batch (watermark 5 min → replica r's fingerprints evict
    # once replica r+6 lands: eviction happens INSIDE the run).
    t0 = "TIMESTAMP '2024-01-01 00:00:00'"
    for r in range(replicas):
        chunk = docs.select(
            (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
            F.when(F.col("doc_id") % 3 == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(f" replica-{r}")))
            .alias("text"),
            F.expr(
                f"{t0} + make_interval(0, 0, 0, 0, 0, {r}, "
                "CAST(doc_id % 60 AS INT))"
            ).alias("ts"),
        )
        chunk.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)  # distinct mtimes → deterministic batch order

    rows_in = base_n * replicas

    # state partitions sized to per-trigger volume, not core count
    # (guide §2/§5; see streaming.size_state_partitions rationale —
    # measured 2.0k → 5.7k rows/s on this exact config)
    n_state = size_state_partitions(spark, base_n * files_per_trigger)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )
    gated = stream.filter(F.size(F.split(F.col("text"), r"\s+")) >= 5)
    deduped = stream_content_dedup(
        gated, "text", "ts", "5 minutes", id_col="doc_id"
    )
    curated = stream_minhash_dedup(
        deduped.drop("content_fp"), "text", "ts", watermark=None,
        id_col="doc_id",
    )

    t_start = time.perf_counter()
    q = (
        curated.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        wall = time.perf_counter() - t_start
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()

    record = {
        "metric": "stream_curation_rows_per_sec",
        **_stats(progress, rows_in, wall),
        "rows_out": spark.read.parquet(out).count(),
        "replicas": replicas,
        "files_per_trigger": files_per_trigger,
        "state_partitions": n_state,
        "sf_dir": sf_dir,
    }
    _publish(record)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
