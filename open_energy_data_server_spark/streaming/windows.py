"""Windowed stream aggregations (tumbling / sliding / session) with
watermark-based late-data handling.

The reference's incremental-batch idioms map onto these directly:
weekly-aligned chunk restarts (T4, /root/reference/crawler/smard.py:141-155)
≡ tumbling windows; the 30-day quality-assurance delay (T3,
/root/reference/crawler/netztransparenz.py:314-317) ≡ the watermark
delay — late data beyond it is dropped.

Every builder below works on BOTH a batch and a streaming DataFrame
(``window``/``session_window`` are mode-agnostic); the conformance
queries run them in batch mode against the DuckDB oracle, the
streaming tests run the same lineage through readStream→memory sink.
At scale, state size is bounded by (watermark delay / slide) × keys —
the watermark is what makes a 100 TB/day stream's state finite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, watermark) if watermark and df.isStreaming else df


def _flatten(agged: DataFrame, win_col: str, start: str, end: str, keys: list[str]) -> DataFrame:
    value_cols = [c for c in agged.columns if c != win_col and c not in keys]
    return agged.select(
        F.col(f"{win_col}.start").alias(start),
        F.col(f"{win_col}.end").alias(end),
        *keys,
        *value_cols,
    )


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed windows: groupBy(window(ts, width), *keys)."""
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    df = _maybe_watermark(df, ts_col, watermark)
    agged = df.groupBy(F.window(ts_col, width).alias("window"), *keys).agg(*aggs)
    return _flatten(agged, "window", "window_start", "window_end", keys)


def sliding_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Overlapping windows: each row lands in width/slide windows."""
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    df = _maybe_watermark(df, ts_col, watermark)
    agged = df.groupBy(F.window(ts_col, width, slide).alias("window"), *keys).agg(*aggs)
    return _flatten(agged, "window", "window_start", "window_end", keys)


def session_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: rows within ``gap`` of each other merge; the
    window end extends ``gap`` past the last event."""
    keys = keys or []
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    df = _maybe_watermark(df, ts_col, watermark)
    agged = df.groupBy(F.session_window(ts_col, gap).alias("session_window"), *keys).agg(*aggs)
    return _flatten(agged, "session_window", "session_start", "session_end", keys)


def stream_dedup(df: DataFrame, keys: list[str], ts_col: str, watermark: str) -> DataFrame:
    """Streaming exact dedup on a key set: state holds one entry per
    key within the watermark horizon, so duplicate events (at-least-
    once sources, crawler re-fetches) are dropped exactly once and
    state is bounded by (horizon × key rate) — the streaming form of
    the write-path PK dedup (A7/K9)."""
    return df.withWatermark(ts_col, watermark).dropDuplicates([*keys, ts_col] if ts_col not in keys else keys)
