"""Streaming per-key EWMA anomaly scoring — stateful, watermark-evicted.

The per-series anomaly scorer every telemetry/quality pipeline needs
in streaming form:

    z_t = (x_t − ewma_{t−1}) / sqrt(ewvar_{t−1})

with the EWMA/EW-variance updated AFTER scoring (an anomalous point
is judged against the state built from its past, then absorbed).
Non-associative and order-dependent per key — not expressible as a
windowed aggregate — and the state is two floats + a count per key,
O(keys) total. Idle keys are evicted by event-time timeout, so
abandoned series don't accumulate state at 100 TB/day.

The recurrence (exponential moving mean/variance):

    ewma'  = ewma + α (x − ewma)
    ewvar' = (1 − α) (ewvar + α (x − ewma)²)

Scoring starts after ``warmup`` points (before that the estimate is
too green to call anomalies; rows emit z = NULL, is_anomaly = false).
``q_ewma`` pins the same recurrence's mean path under the relational
oracle gate.

Two constructors, same semantics:

- ``stream_ewma_anomaly`` — ``applyInPandasWithState`` (works on a
  stock PySpark install; the tested path).
- ``stream_ewma_anomaly_tws`` — the Spark-4 arbitrary-state API
  (``transformWithStateInPandas``, SPARK-46815: typed state vars
  behind a RocksDB store + timers). Its Python↔JVM state protocol
  needs the ``protobuf`` package; the constructor raises a clear
  ImportError naming that seam when protobuf is absent (as in this
  container), and the test suite skips it accordingly.

Reference parity: the reference flags bad readings at crawl time with
static bounds (e.g. /root/reference/crawler/opsd.py value filters);
this is the adaptive streaming form.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from open_energy_data_server_spark.streaming.stateful import _interval_ms

ANOMALY_OUTPUT = (
    "user_id bigint, ts timestamp, value double, z double, "
    "is_anomaly boolean, n_seen bigint"
)
ANOMALY_STATE = "n bigint, ewma double, ewvar double"


def _score_batch(
    key, allp: pd.DataFrame, st: tuple, alpha: float, z_thr: float,
    warmup: int,
) -> tuple[pd.DataFrame, tuple]:
    """Shared scoring/update fold for both API backends."""
    n, ewma, ewvar = st
    out = {"ts": [], "value": [], "z": [], "is_anomaly": [], "n_seen": []}
    for ts, x in zip(allp["ts"], allp["value"]):
        x = float(x)
        z = (x - ewma) / math.sqrt(ewvar) if n >= warmup and ewvar > 0 else None
        out["ts"].append(ts)
        out["value"].append(x)
        out["z"].append(z)
        out["is_anomaly"].append(z is not None and abs(z) > z_thr)
        out["n_seen"].append(n)
        d = x - ewma  # absorb the point AFTER scoring it
        ewma += alpha * d
        ewvar = (1.0 - alpha) * (ewvar + alpha * d * d)
        n += 1
    frame = pd.DataFrame(
        {
            "user_id": [key[0]] * len(out["ts"]),
            "ts": out["ts"],
            "value": out["value"],
            "z": out["z"],
            "is_anomaly": out["is_anomaly"],
            "n_seen": out["n_seen"],
        }
    )
    return frame, (n, ewma, ewvar)


def stream_ewma_anomaly(
    events: DataFrame,
    watermark: str = "10 minutes",
    alpha: float = 0.125,
    z_threshold: float = 3.0,
    warmup: int = 8,
    ttl: str = "60 minutes",
) -> DataFrame:
    """Score every event against its key's running EWMA/EW-variance
    and flag |z| > ``z_threshold``; state evicts after ``ttl`` of
    event-time inactivity per key (EventTimeTimeout). ``events``
    needs (user_id, ts, value); the watermark applies on ``ts``."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ttl_ms = _interval_ms(ttl)

    def update(
        key: tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        pdfs = [p for p in batches if not p.empty]
        if not pdfs:
            return
        allp = pd.concat(pdfs).sort_values(["ts", "value"])
        st = tuple(state.get) if state.exists else (0, 0.0, 0.0)
        frame, st = _score_batch(key, allp, st, alpha, z_threshold, warmup)
        state.update(st)
        last_ms = int(allp["ts"].max().timestamp() * 1000)
        state.setTimeoutTimestamp(
            max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield frame

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            ANOMALY_OUTPUT,
            ANOMALY_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_ewma_anomaly_tws(
    events: DataFrame,
    watermark: str = "10 minutes",
    alpha: float = 0.125,
    z_threshold: float = 3.0,
    warmup: int = 8,
    ttl: str = "60 minutes",
):
    """Same operator on the Spark-4 arbitrary-state API
    (``transformWithStateInPandas``): one ValueState per key plus an
    event-time eviction timer re-armed each batch. The API's
    Python↔JVM state protocol needs ``google.protobuf``: when the real
    package is absent the vendored mini runtime (``vendor/google/
    protobuf``, wire-format-from-spec) is used, on the driver AND
    pushed to the session's Python workers; raises ImportError only if
    neither is importable. Needs the RocksDB state-store provider on
    the session (the only provider implementing the TWS column
    families)."""
    from open_energy_data_server_spark.vendor import (
        ensure_protobuf,
        propagate_to_workers,
    )

    if not ensure_protobuf():  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package "
            "(pyspark.sql.streaming.proto) and the vendored fallback "
            "failed to import; install protobuf or use "
            "stream_ewma_anomaly (applyInPandasWithState, same "
            "semantics)"
        )
    propagate_to_workers(events.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    ttl_ms = _interval_ms(ttl)

    class _Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("ewma_state", ANOMALY_STATE)

        def handleInputRows(self, key, rows, timerValues):
            pdfs = [p for p in rows if not p.empty]
            if not pdfs:
                return
            allp = pd.concat(pdfs).sort_values(["ts", "value"])
            st = (
                tuple(self._state.get())
                if self._state.exists()
                else (0, 0.0, 0.0)
            )
            frame, st = _score_batch(
                key, allp, st, alpha, z_threshold, warmup
            )
            self._state.update(st)
            last_ms = int(allp["ts"].max().timestamp() * 1000)
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(last_ms + ttl_ms)
            yield frame

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            self._state.clear()
            return iter(())

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            _Proc(),
            ANOMALY_OUTPUT,
            outputMode="Append",
            timeMode="EventTime",
            eventTimeColumnName="ts",
        )
    )
