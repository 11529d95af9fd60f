"""Round-10: CDC change-log materialization (batch conformance).

The events table replayed as a change stream — signup opens a key,
error tombstones it, click/view/purchase upsert — materialized into
the per-user current snapshot by ``operators.cdc.cdc_current_snapshot``
(one ``max_by`` hash aggregation; see that module's scale note for why
not a window sort). The streaming twin (`streaming/cdc.py`) is pinned
row-for-row against this operator in tests/test_streaming_cdc.py.

Reference parity: the reference's unique-index upsert ingestion
(`/root/reference/init.sql`, crawler ON CONFLICT paths) is the
no-delete special case of this replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.cdc import (
    cdc_current_snapshot,
    cdc_op_from_event_type,
)
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import sql_ts_str, ts_str


@query(
    "q_cdc_current_snapshot",
    oracle=f"""
    SELECT user_id,
           {sql_ts_str("ts")} AS changed_at,
           op AS last_op,
           value AS current_value
    FROM (
      SELECT user_id, ts, event_id, value,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND op <> 'D'
    ORDER BY user_id
    """,
)
def q_cdc_current_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state materialization of a CDC change log: latest
    change per user by (ts, event_id), delete tombstones dropped.
    The oracle states it in the natural window formulation; the
    engine runs the max_by aggregation — one shuffle of per-partition
    winners, no sort (the form that survives a 100 TB change log)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.col("event_id").alias("seq"),
        cdc_op_from_event_type("event_type").alias("op"),
        "value",
    )
    cur = cdc_current_snapshot(
        ev, ["user_id"], ts_col="ts", seq_col="seq", op_col="op"
    )
    return cur.select(
        "user_id",
        ts_str("ts").alias("changed_at"),
        F.col("op").alias("last_op"),
        F.col("value").alias("current_value"),
    ).orderBy("user_id")
