"""Custom stateful streaming operator via applyInPandasWithState.

Running per-key statistics (count / sum / last value) maintained
across micro-batches — the shape for "current state" tables like the
reference's latest-reading dashboards (W2) fed from a stream instead
of repeated batch queries.

State per key is three scalars → total state = O(keys), independent
of stream volume; with watermarked event-time timeouts, abandoned
keys age out (GroupStateTimeout), keeping 100 TB/day streams bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = "user_id bigint, n bigint, total double, last_value double"
STATE_SCHEMA = "n bigint, total double, last_value double"


def running_user_stats(events: DataFrame) -> DataFrame:
    """(user_id, n, total, last_value) updated per micro-batch.

    Works only on a streaming DataFrame grouped by user_id; each batch
    emits the refreshed running totals for keys present in the batch.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, last = state.get if state.exists else (0, 0.0, None)
        last_ts = None
        for pdf in batches:
            if pdf.empty:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            pdf_sorted = pdf.sort_values("ts")
            last = float(pdf_sorted["value"].iloc[-1])
            last_ts = pdf_sorted["ts"].iloc[-1]
        state.update((n, total, last))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [total], "last_value": [last]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )


OUTPUT_SCHEMA_TTL = "user_id bigint, n bigint, total double, last_value double, expired boolean"
STATE_SCHEMA_TTL = "n bigint, total double, last_value double, last_ts_ms bigint"


def running_user_stats_ttl(events: DataFrame, ttl: str = "30 minutes") -> DataFrame:
    """TTL variant: per-key state expires ``ttl`` past the key's last
    EVENT time (not wall clock — EventTimeTimeout keyed to the
    watermark, so replays are deterministic). When the watermark passes
    a key's deadline the operator emits one tombstone row
    (``expired=true``, final totals) and removes the state; a later
    event for the key starts a fresh accumulation. This is the bounded-
    state form of W2 "current state" tables: total state = O(active
    keys in the TTL horizon), whatever the stream volume.

    ``events`` must already carry a watermark on ``ts`` (the timeout
    clock IS the watermark)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_ms = _interval_ms(ttl)

    def update(
        key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, last, _ = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n": [n],
                    "total": [total],
                    "last_value": [last],
                    "expired": [True],
                }
            )
            return
        n, total, last, last_ts_ms = state.get if state.exists else (0, 0.0, None, -1)
        # last_value/deadline follow the MAX EVENT TIME seen so far —
        # compared per chunk AND against state, because Arrow chunks
        # within a batch arrive in arbitrary order and a late-but-valid
        # older event must neither overwrite last_value nor drag the
        # TTL deadline backwards
        for pdf in batches:
            if pdf.empty:
                continue
            n += len(pdf)
            total += float(pdf["value"].sum())
            idx = pdf["ts"].idxmax()
            chunk_ms = int(pdf["ts"].loc[idx].timestamp() * 1000)
            if chunk_ms > last_ts_ms:
                last_ts_ms = chunk_ms
                last = float(pdf["value"].loc[idx])
        state.update((n, total, last, last_ts_ms))
        if last_ts_ms >= 0:
            # deadline = newest event time + TTL, floored above the
            # current watermark (Spark rejects timeouts at/below it)
            deadline = max(last_ts_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(deadline)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n": [n],
                "total": [total],
                "last_value": [last],
                "expired": [False],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update, OUTPUT_SCHEMA_TTL, STATE_SCHEMA_TTL, "update", GroupStateTimeout.EventTimeTimeout
    )


def _interval_ms(interval: str) -> int:
    """'30 minutes' → 1_800_000. Supports the unit names Spark's
    interval grammar uses (singular or plural)."""
    qty, unit = interval.strip().split()
    scale = {
        "millisecond": 1, "second": 1000, "minute": 60_000,
        "hour": 3_600_000, "day": 86_400_000,
    }[unit.rstrip("s").lower()]
    return int(float(qty) * scale)


COALESCE_OUTPUT = (
    "user_id bigint, window_start timestamp, window_end timestamp, "
    "n_raw bigint, closed_by string"
)
COALESCE_STATE = "start_ms bigint, end_ms bigint, n_raw bigint"


def interval_coalescer(intervals: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming interval coalescing — the stream form of the batch
    q_interval_coalesce: per key, overlapping/touching incident
    windows ``[s, e)`` merge into one open window held in state; a
    CLOSED (maximal) window is emitted either when a later interval
    starts beyond the running end (``closed_by='new_window'``) or when
    the watermark passes the open window's end
    (``closed_by='timeout'`` — the incident is over and no
    in-lateness-bound interval can still extend it). This is the
    open/close outage-record emitter behind alerting pipelines.

    State per key is three scalars (start, running max end, raw
    count) → O(keys), independent of stream volume; EventTimeTimeout
    keys finalization to the WATERMARK, so replays are deterministic
    and lateness tolerance equals the watermark delay. Intervals that
    arrive AFTER their window was closed (beyond the watermark) start
    a new window rather than retro-merging — the standard streaming
    trade, bounded exactly by ``watermark``.

    ``intervals`` needs columns (user_id, s timestamp, e timestamp);
    the watermark is applied here on ``s``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _emit(key, st, closed_by):
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "window_start": [pd.Timestamp(st[0], unit="ms")],
                "window_end": [pd.Timestamp(st[1], unit="ms")],
                "n_raw": [st[2]],
                "closed_by": [closed_by],
            }
        )

    def update(
        key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            st = state.get
            state.remove()
            yield _emit(key, st, "timeout")
            return
        pdfs = [p for p in batches if not p.empty]
        cur = list(state.get) if state.exists else None
        closed = []
        if pdfs:
            allp = pd.concat(pdfs).sort_values(["s", "e"])
            for s, e in zip(allp["s"], allp["e"]):
                sm = int(s.timestamp() * 1000)
                em = int(e.timestamp() * 1000)
                if cur is None:
                    cur = [sm, em, 1]
                elif sm <= cur[1]:
                    # extends (or is contained in) the open window
                    cur[1] = max(cur[1], em)
                    cur[2] += 1
                else:
                    closed.append(tuple(cur))
                    cur = [sm, em, 1]
        for st in closed:
            yield _emit(key, st, "new_window")
        if cur is not None:
            state.update(tuple(cur))
            # close once the watermark passes the open window's end
            # (floored above the current watermark — Spark rejects
            # timeouts at/below it)
            state.setTimeoutTimestamp(
                max(cur[1], state.getCurrentWatermarkMs() + 1)
            )

    return (
        intervals.withWatermark("s", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            COALESCE_OUTPUT,
            COALESCE_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
