"""Exactly-once streaming delivery to a parquet lake via foreachBatch.

Structured Streaming's file sink is exactly-once only for its OWN
output layout; any custom delivery (partition-restated writes, MERGE
into a table, an external store) goes through ``foreachBatch`` — which
is at-least-once: after a crash between "batch written" and "offsets
committed", the SAME (batch_id, data) pair is replayed. The standard
pattern (documented in the Spark Structured Streaming guide) is an
idempotent sink keyed by ``batch_id``: a replayed batch id overwrites
its own previous output instead of appending a duplicate.

``BatchIdLedgerSink`` realizes it for a parquet lake:
- every delivery writes to ``<root>/batch_id=<id>/`` with
  mode="overwrite" — the replay of a half-written batch replaces it
  byte-for-byte (same data, deterministic content), never doubles it;
- the lake reads back as one DataFrame with the ledger column intact
  (``read()``), so the ledger doubles as delivery provenance;
- downstream consumers that must not see a batch twice filter on a
  committed-ids manifest (``committed()``) written AFTER the data —
  write-then-publish ordering makes the publish atomic on any
  filesystem with atomic rename.

Scale notes: each micro-batch is a normal distributed parquet write
(partitioned by whatever the payload carries); the per-batch overwrite
touches only that batch's directory, never the lake. The manifest is
one tiny file per batch — O(batches) driver-side metadata, no listing
of data files needed to establish what is committed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BatchIdLedgerSink:
    """Idempotent foreachBatch target: ``sink.apply`` is the function
    passed to ``writeStream.foreachBatch``."""

    def __init__(self, root: str) -> None:
        self.root = root
        self._manifest_dir = os.path.join(root, "_committed")

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                os.path.join(self.root, f"batch_id={batch_id}")
            )
        )
        # publish AFTER the data: replayed crashes re-run the write
        # above (idempotent overwrite) before re-publishing
        os.makedirs(self._manifest_dir, exist_ok=True)
        marker = os.path.join(self._manifest_dir, f"{batch_id}.json")
        tmp = marker + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"batch_id": batch_id, "rows": batch_df.count()}, fh)
        os.replace(tmp, marker)  # atomic rename = the commit point

    def committed(self) -> list[int]:
        if not os.path.isdir(self._manifest_dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self._manifest_dir)
            if f.endswith(".json")
        )

    def read(self, spark: SparkSession, committed_only: bool = True) -> DataFrame:
        df = spark.read.option("basePath", self.root).parquet(
            os.path.join(self.root, "batch_id=*")
        )
        if committed_only:
            ids = self.committed()
            df = df.filter(F.col("batch_id").isin(ids) if ids else F.lit(False))
        return df
