"""Incremental-batch framework (SURVEY §2.9, T1–T5).

The reference has no streaming engine — every crawler is incremental
batch with a durable watermark and late-data policies. Mapping:

- T1 watermark = ``max(ts)`` of the destination
  (/root/reference/crawler/entsoe_crawler.py:217-262) → probe the lake
  table (parquet footer min/max keeps it cheap; on a date-partitioned
  table, partition listing bounds the probe).
- T2 external watermark store when the table probe fails
  (regelleistung's JSON file, regelleistung.py:29-30,758-790) → a
  JSON state file next to the lake.
- T3 late-data policy: only load data older than a quality delay
  (netztransparenz.py:314-317 '30 days') → upper-bound filter.
- T4 period alignment: restart from the last aligned boundary
  (smard.py:141-155 'last Sunday 22:00') → floor the watermark to the
  period grid.
- T5 chunked backfill ranges (ecmwf.py:265-305) → a generated list of
  (start, end) windows for the driver loop.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.sinks.writer import read_table_or_none, write_table


def probe_watermark(
    spark: SparkSession, lake_root: str, schema: str, table: str, ts_col: str
) -> dt.datetime | None:
    """T1: resume point = max(ts) already in the destination."""
    df = read_table_or_none(spark, lake_root, schema, table)
    if df is None or ts_col not in df.columns:
        return None
    return df.agg(F.max(ts_col)).collect()[0][0]


class WatermarkStore:
    """T2: durable JSON watermark store for sources where the table
    probe is impossible/expensive."""

    def __init__(self, path: str):
        self.path = path

    def get(self, key: str) -> dt.datetime | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            raw = json.load(f).get(key)
        return dt.datetime.fromisoformat(raw) if raw else None

    def set(self, key: str, value: dt.datetime) -> None:
        state = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                state = json.load(f)
        state[key] = value.isoformat()
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)


def align_to_period(
    ts: dt.datetime, period: dt.timedelta, origin: dt.datetime = dt.datetime(2000, 1, 3)
) -> dt.datetime:
    """T4: floor a timestamp onto a period grid anchored at ``origin``
    (default Monday 2000-01-03, the TimescaleDB week origin)."""
    delta = ts - origin
    periods = delta // period
    return origin + periods * period


def backfill_windows(
    start: dt.datetime, end: dt.datetime, chunk: dt.timedelta
) -> list[tuple[dt.datetime, dt.datetime]]:
    """T5: [start, end) split into bounded request windows."""
    out = []
    cur = start
    while cur < end:
        nxt = min(cur + chunk, end)
        out.append((cur, nxt))
        cur = nxt
    return out


def incremental_append(
    df: DataFrame,
    lake_root: str,
    schema: str,
    table: str,
    ts_col: str,
    quality_delay: dt.timedelta | None = None,
    now: dt.datetime | None = None,
    **write_kwargs,
) -> tuple[str, int]:
    """T1+T3: append only rows newer than the destination watermark
    and (optionally) older than the quality-assurance delay. Returns
    (path, rows_written)."""
    spark = df.sparkSession
    wm = probe_watermark(spark, lake_root, schema, table, ts_col)
    if wm is not None:
        df = df.filter(F.col(ts_col) > F.lit(wm))
    if quality_delay is not None:
        cutoff = (now or dt.datetime.utcnow()) - quality_delay
        df = df.filter(F.col(ts_col) < F.lit(cutoff))
    df = df.cache()
    n = df.count()
    if n:
        write_table(df, lake_root, schema, table, mode="append", time_col=ts_col, **write_kwargs)
    df.unpersist()
    return os.path.join(lake_root, schema, table), n
