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
  write-then-publish ordering makes the publish the commit point.

The manifest lives on the SAME filesystem as the data: markers are
created through the Hadoop FileSystem API resolved from the root URI
(local path, HDFS, s3a://, ...), not driver-local ``os`` calls — a
local-disk manifest beside an object-store lake would silently
un-commit every batch on driver replacement. Publish is
create-temp + rename; on filesystems without atomic rename (plain
S3), pair the lake with a committer that provides it, as for any
Spark output.

Scale notes: each micro-batch is a normal distributed parquet write
(partitioned by whatever the payload carries); the per-batch overwrite
touches only that batch's directory, never the lake. The manifest is
one tiny file per batch — O(batches) metadata, no listing of data
files needed to establish what is committed. No extra pass over the
batch: the marker records only the batch id (a row count would
recompute the whole micro-batch, doubling per-batch latency).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class BatchIdLedgerSink:
    """Idempotent foreachBatch target: ``sink.apply`` is the function
    passed to ``writeStream.foreachBatch``."""

    def __init__(self, root: str) -> None:
        self.root = root.rstrip("/")
        self._manifest_dir = self.root + "/_committed"
        self._spark: SparkSession | None = None

    # -- Hadoop FS helpers (same filesystem as the data) ---------------

    def _fs(self, spark: SparkSession):
        jvm = spark._jvm
        jsc = spark._jsc
        path = jvm.org.apache.hadoop.fs.Path(self.root)
        return jvm, path.getFileSystem(jsc.hadoopConfiguration())

    def _publish(self, spark: SparkSession, batch_id: int) -> None:
        jvm, fs = self._fs(spark)
        hpath = jvm.org.apache.hadoop.fs.Path
        fs.mkdirs(hpath(self._manifest_dir))
        tmp = hpath(f"{self._manifest_dir}/{batch_id}.json.tmp")
        out = fs.create(tmp, True)
        out.write(bytearray(json.dumps({"batch_id": batch_id}).encode("utf-8")))
        out.close()
        # rename = the commit point (atomic where the FS provides it).
        # Hadoop rename reports failure via a false RETURN on several
        # filesystems rather than throwing — swallowing it would report
        # success with the batch unpublished. dest-already-exists means
        # a replay of an already-committed batch: drop the tmp, done.
        dest = hpath(f"{self._manifest_dir}/{batch_id}.json")
        if not fs.rename(tmp, dest):
            if fs.exists(dest):
                fs.delete(tmp, False)
            else:
                raise IOError(
                    f"publish failed: rename({tmp}, {dest}) returned false"
                )

    def apply(self, batch_df: DataFrame, batch_id: int) -> None:
        self._spark = batch_df.sparkSession
        batch_df.write.mode("overwrite").parquet(
            f"{self.root}/batch_id={batch_id}"
        )
        # publish AFTER the data: replayed crashes re-run the write
        # above (idempotent overwrite) before re-publishing
        self._publish(batch_df.sparkSession, batch_id)

    def committed(self, spark: SparkSession | None = None) -> list[int]:
        spark = spark or self._spark
        if spark is None:
            raise ValueError("committed() before any apply(): pass a SparkSession")
        jvm, fs = self._fs(spark)
        mpath = jvm.org.apache.hadoop.fs.Path(self._manifest_dir)
        if not fs.exists(mpath):
            return []
        out = []
        for st in fs.listStatus(mpath):
            name = st.getPath().getName()
            if name.endswith(".json"):
                out.append(int(name.split(".")[0]))
        return sorted(out)

    def _batch_dirs(self, spark: SparkSession) -> bool:
        """True iff at least one ``batch_id=*`` directory exists."""
        jvm, fs = self._fs(spark)
        root = jvm.org.apache.hadoop.fs.Path(self.root)
        if not fs.exists(root):
            return False
        return any(
            st.getPath().getName().startswith("batch_id=")
            for st in fs.listStatus(root)
        )

    def read(
        self,
        spark: SparkSession,
        committed_only: bool = True,
        as_of_batch: int | None = None,
    ) -> DataFrame:
        """Read the lake; ``as_of_batch`` gives TIME TRAVEL — the table
        exactly as it stood after that batch committed (batches are
        append-only and id-ordered, so a snapshot is just an id
        filter; partition pruning on ``batch_id`` makes it a metadata
        operation, the poor-lake's Iceberg snapshot read)."""
        if not self._batch_dirs(spark):
            # an empty lake is a valid state (stream not started yet) —
            # return an empty, schema-less-but-readable frame instead of
            # surfacing the glob's path-not-found
            return spark.createDataFrame([], "batch_id bigint")
        df = spark.read.option("basePath", self.root).parquet(
            f"{self.root}/batch_id=*"
        )
        if committed_only:
            ids = self.committed(spark)
            if as_of_batch is not None:
                ids = [i for i in ids if i <= as_of_batch]
            df = df.filter(F.col("batch_id").isin(ids) if ids else F.lit(False))
        elif as_of_batch is not None:
            df = df.filter(F.col("batch_id") <= as_of_batch)
        return df
