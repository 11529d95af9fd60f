"""Streaming CDC materialization + as-of dimension enrichment.

Two stateful operators a continuously-ingesting lakehouse actually
runs, both with watermark-bounded state:

- ``stream_cdc_apply`` — the streaming twin of
  ``operators.cdc.cdc_current_snapshot``: fold a CDC change stream
  ``(key…, ts, seq, op, payload…)`` into per-key current state on the
  Spark-4 arbitrary-state API (``transformWithStateInPandas``),
  emitting one row per key per micro-batch *when the current row
  changed* (per-batch debounce — the contract every CDC materializer
  documents). Out-of-order changes within the watermark are ignored
  iff they lose the ``(ts, seq)`` comparison, so replays and shuffled
  partitions converge to the same state as the batch operator.
  Delete tombstones stay in state only for ``tombstone_ttl`` of event
  time, then an event-time timer garbage-collects the key — the
  unbounded-key-space hazard (every deleted entity forever) is
  bounded by construction. State: ONE row per live key.

- ``stream_asof_enrich`` — streaming form of the batch as-of join
  (`operators/asof.py:55`, J6): facts arrive on one stream, slowly-
  changing dimension versions on another; each fact is enriched with
  the latest dim version at-or-before its event time. Facts buffer in
  per-key state ONLY until the watermark passes their timestamp —
  at that point every dim version that could precede them has arrived
  (by the watermark contract), the match is final, and the fact is
  emitted exactly once. Dim versions older than the watermark are
  pruned down to the single latest one (still needed by future
  facts); idle keys evict after ``ttl``. State per key: facts within
  the watermark horizon + dims within the horizon + 1.

Both are pinned row-for-row against their batch twins in
tests/test_streaming_cdc.py, and both survive checkpoint restarts.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_energy_data_server_spark.streaming.stateful import _interval_ms

_KIND = "asof_kind"


def _ddl(df: DataFrame, cols: Sequence[str]) -> str:
    """``name type, …`` DDL for a subset of ``df``'s columns."""
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ", ".join(f"{c} {by_name[c]}" for c in cols)


def _struct_ddl(df: DataFrame, cols: Sequence[str]) -> str:
    """``name:type,…`` (simpleString form) for use inside struct<>."""
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    return ",".join(f"{c}:{by_name[c]}" for c in cols)


def _py(v: Any) -> Any:
    """numpy scalar → plain Python (state serializers want natives)."""
    return v.item() if hasattr(v, "item") else v


def stream_cdc_apply(
    changes: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    watermark: str = "10 minutes",
    delete_ops: Sequence[str] = ("D",),
    tombstone_ttl: str = "60 minutes",
) -> DataFrame:
    """Materialize a CDC change stream into per-key current rows on
    ``transformWithStateInPandas``. Emits ``key…, ts, seq, op,
    payload…, is_deleted`` whenever a micro-batch changes a key's
    current row; downstream sinks upsert on the keys (or delete on
    ``is_deleted``). Requires the RocksDB state-store provider (the
    only one implementing TWS column families) and the protobuf
    state protocol (vendored fallback auto-engages)."""
    from open_energy_data_server_spark.vendor import (
        ensure_protobuf,
        propagate_to_workers,
    )

    if not ensure_protobuf():  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package and "
            "the vendored fallback failed to import; materialize with the "
            "batch operators.cdc.cdc_current_snapshot instead"
        )
    propagate_to_workers(changes.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    keys = list(key_cols)
    others = [c for c in changes.columns if c not in keys]
    payload = [c for c in others if c not in (ts_col, seq_col, op_col)]
    out_schema = (
        _ddl(changes, keys)
        + ", "
        + _ddl(changes, [ts_col, seq_col, op_col] + payload)
        + ", is_deleted boolean"
    )
    # ts kept as raw int64 nanos in state: exact round-trip, no tz math
    state_schema = (
        "ts_ns bigint, "
        + _ddl(changes, [seq_col, op_col])
        + ((", " + _ddl(changes, payload)) if payload else "")
    )
    ttl_ms = _interval_ms(tombstone_ttl)
    dels = set(delete_ops)

    class _Materialize(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._cur = handle.getValueState("cdc_current", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            pdfs = [p for p in rows if not p.empty]
            if not pdfs:
                return
            allp = pd.concat(pdfs).sort_values([ts_col, seq_col])
            last = allp.iloc[-1]
            b_ts_ns = int(pd.Timestamp(last[ts_col]).value)
            b_seq = int(last[seq_col])
            if self._cur.exists():
                st = tuple(self._cur.get())
                if (b_ts_ns, b_seq) <= (int(st[0]), int(st[1])):
                    return  # stale replay / out-of-order: state wins
            new_op = str(last[op_col])
            self._cur.update(
                (b_ts_ns, b_seq, new_op)
                + tuple(_py(last[c]) for c in payload)
            )
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            if new_op in dels:  # tombstone GC grace period
                self._handle.registerTimer(b_ts_ns // 1_000_000 + ttl_ms)
            yield pd.DataFrame(
                {
                    **{k: [key[i]] for i, k in enumerate(keys)},
                    ts_col: [pd.Timestamp(b_ts_ns)],
                    seq_col: [b_seq],
                    op_col: [new_op],
                    **{c: [last[c]] for c in payload},
                    "is_deleted": [new_op in dels],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # fires only for tombstoned keys: the grace period for
            # late out-of-order resurrections has passed — drop the key
            self._cur.clear()
            return iter(())

        def close(self) -> None:
            pass

    return (
        changes.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .transformWithStateInPandas(
            _Materialize(),
            out_schema,
            outputMode="Append",
            timeMode="EventTime",
            eventTimeColumnName=ts_col,
        )
    )


def _asof_tagged(
    facts: DataFrame,
    dims: DataFrame,
    key_col: str,
    ts_col: str,
    f_cols: Sequence[str],
    d_cols: Sequence[str],
) -> tuple[DataFrame, str]:
    """Union the two streams into one keyed stream (``asof_kind``
    1=fact, 0=dim, the other side's columns null) + the output DDL.
    The tag deliberately has NO leading underscore: the
    transformWithState Arrow serializer positionally renames
    underscore-leading columns (``_kind`` arrives as ``_2``)."""
    if _KIND in list(f_cols) + list(d_cols):
        raise ValueError(f"column name {_KIND!r} is reserved by the as-of operator")
    tagged = facts.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias(_KIND),
        *[F.col(c) for c in f_cols],
        *[F.lit(None).cast(dims.schema[c].dataType).alias(c) for c in d_cols],
    ).unionByName(
        dims.select(
            F.col(key_col),
            F.col(ts_col),
            F.lit(0).alias(_KIND),
            *[
                F.lit(None).cast(facts.schema[c].dataType).alias(c)
                for c in f_cols
            ],
            *[F.col(c) for c in d_cols],
        )
    )
    out_schema = (
        _ddl(facts, [key_col, ts_col]) + ", " + _ddl(facts, f_cols)
        + ", " + _ddl(dims, d_cols)
    )
    return tagged, out_schema


def _asof_ingest(
    batches: Iterator[pd.DataFrame],
    ts_col: str,
    f_cols: Sequence[str],
    d_cols: Sequence[str],
    fact_buf: list,
    dim_buf: list,
) -> None:
    """Append a micro-batch's tagged rows into the two buffers
    (in-place)."""
    for p in batches:
        if p.empty:
            continue
        kinds = p[_KIND].tolist()
        ts_vals = [int(pd.Timestamp(t).value) for t in p[ts_col]]
        f_vals = [p[c].tolist() for c in f_cols]
        d_vals = [p[c].tolist() for c in d_cols]
        for i, kind in enumerate(kinds):
            if kind == 1:
                fact_buf.append((ts_vals[i],) + tuple(v[i] for v in f_vals))
            else:
                dim_buf.append((ts_vals[i],) + tuple(v[i] for v in d_vals))


def _asof_match(
    fact_buf: list,
    dim_buf: list,
    wm_ns: int,
    key0: Any,
    key_col: str,
    ts_col: str,
    f_cols: Sequence[str],
    d_cols: Sequence[str],
) -> tuple[pd.DataFrame | None, list, list]:
    """The shared as-of fold (both state-API backends): emit every
    fact the watermark has passed, matched to the latest dim version
    at-or-before its timestamp; prune dims to those a future fact can
    still need. Returns (emission or None, facts kept, dims kept)."""
    fact_buf.sort(key=lambda t: t[0])
    dim_buf.sort(key=lambda t: t[0])
    ready = [t for t in fact_buf if t[0] <= wm_ns]
    fact_buf = [t for t in fact_buf if t[0] > wm_ns]
    out = None
    if ready:
        dim_ts = [t[0] for t in dim_buf]
        out_rows = []
        for t in ready:
            i = bisect_right(dim_ts, t[0]) - 1
            dim_vals = (
                tuple(dim_buf[i][1:]) if i >= 0 else (None,) * len(d_cols)
            )
            out_rows.append((key0, pd.Timestamp(t[0])) + t[1:] + dim_vals)
        out = pd.DataFrame(
            out_rows, columns=[key_col, ts_col] + list(f_cols) + list(d_cols)
        )
    # future facts can only need dim versions newer than the
    # watermark, plus the single latest at-or-before it
    keep_from = bisect_right([t[0] for t in dim_buf], wm_ns) - 1
    if keep_from > 0:
        dim_buf = dim_buf[keep_from:]
    return out, fact_buf, dim_buf


def stream_asof_enrich(
    facts: DataFrame,
    dims: DataFrame,
    key_col: str,
    ts_col: str,
    fact_cols: Sequence[str],
    dim_cols: Sequence[str],
    watermark: str = "10 minutes",
    ttl: str = "60 minutes",
) -> DataFrame:
    """Enrich each fact with the latest dim version at-or-before its
    event time (``pd.merge_asof`` 'backward' semantics, per key), in
    streaming: facts and dim updates are two streams, matches are
    emitted exactly once — when the watermark passes the fact's
    timestamp, at which point no earlier dim version can still arrive
    and the match is FINAL. Facts that precede every dim version emit
    with null dim columns (same contract as the batch as-of join).

    Output: ``key_col, ts_col, fact_cols…, dim_cols…`` in fact event-
    time order per key per flush."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    f_cols = list(fact_cols)
    d_cols = list(dim_cols)
    tagged, out_schema = _asof_tagged(
        facts, dims, key_col, ts_col, f_cols, d_cols
    )
    state_schema = (
        f"facts array<struct<ts_ns:bigint,{_struct_ddl(facts, f_cols)}>>, "
        f"dims array<struct<ts_ns:bigint,{_struct_ddl(dims, d_cols)}>>"
    )
    ttl_ms = _interval_ms(ttl)

    def flush(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            fact_buf = [tuple(r) for r in st[0]]
            dim_buf = [tuple(r) for r in st[1]]
        else:
            fact_buf, dim_buf = [], []
        _asof_ingest(batches, ts_col, f_cols, d_cols, fact_buf, dim_buf)
        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        out, fact_buf, dim_buf = _asof_match(
            fact_buf, dim_buf, wm_ns, key[0], key_col, ts_col, f_cols, d_cols
        )
        if out is not None:
            yield out
        if not fact_buf and not dim_buf:
            state.remove()
            return
        state.update((fact_buf, dim_buf))
        if fact_buf:
            # facts are waiting on the watermark, not on more input:
            # re-arm an immediate event-time timeout so they flush on
            # the next batch even if this key receives nothing more
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        else:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            yield from flush(key, iter(()), state)
        else:
            yield from flush(key, batches, state)

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_asof_enrich_tws(
    facts: DataFrame,
    dims: DataFrame,
    key_col: str,
    ts_col: str,
    fact_cols: Sequence[str],
    dim_cols: Sequence[str],
    watermark: str = "10 minutes",
    ttl: str = "60 minutes",
) -> DataFrame:
    """Same operator on the Spark-4 arbitrary-state API
    (``transformWithStateInPandas``): the fact and dim buffers are two
    typed ``ListState`` variables (appended per batch, rewritten on
    flush) instead of one packed array-struct value, and the
    flush-on-watermark trigger is an explicit event-time timer. The
    as-of fold itself (`_asof_match`) is byte-identical to the
    applyInPandasWithState variant — two state APIs, one semantics
    (pinned row-for-row in tests/test_streaming_cdc.py). Needs the
    RocksDB state-store provider; the vendored protobuf runtime
    auto-engages when the real package is absent."""
    from open_energy_data_server_spark.vendor import (
        ensure_protobuf,
        propagate_to_workers,
    )

    if not ensure_protobuf():  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the 'protobuf' package and "
            "the vendored fallback failed to import; use "
            "stream_asof_enrich (applyInPandasWithState, same semantics)"
        )
    propagate_to_workers(facts.sparkSession)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    f_cols = list(fact_cols)
    d_cols = list(dim_cols)
    tagged, out_schema = _asof_tagged(
        facts, dims, key_col, ts_col, f_cols, d_cols
    )
    fact_elem = f"ts_ns bigint, {_ddl(facts, f_cols)}"
    dim_elem = f"ts_ns bigint, {_ddl(dims, d_cols)}"
    ttl_ms = _interval_ms(ttl)

    class _AsofProc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._facts = handle.getListState("asof_facts", fact_elem)
            self._dims = handle.getListState("asof_dims", dim_elem)

        def _fold(self, key, batches, wm_ms):
            fact_buf = (
                [tuple(r) for r in self._facts.get()]
                if self._facts.exists()
                else []
            )
            dim_buf = (
                [tuple(r) for r in self._dims.get()]
                if self._dims.exists()
                else []
            )
            _asof_ingest(batches, ts_col, f_cols, d_cols, fact_buf, dim_buf)
            out, fact_buf, dim_buf = _asof_match(
                fact_buf,
                dim_buf,
                wm_ms * 1_000_000,
                key[0],
                key_col,
                ts_col,
                f_cols,
                d_cols,
            )
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            # ListState.put([]) is ILLEGAL_STATE_STORE_VALUE —
            # an empty buffer must clear() its variable instead
            if fact_buf:
                self._facts.put(fact_buf)
            else:
                self._facts.clear()
            if dim_buf:
                self._dims.put(dim_buf)
            else:
                self._dims.clear()
            if fact_buf or dim_buf:
                self._handle.registerTimer(
                    wm_ms + (1 if fact_buf else ttl_ms)
                )
            if out is not None:
                yield out

        def handleInputRows(self, key, rows, timerValues):
            yield from self._fold(
                key, rows, timerValues.getCurrentWatermarkInMs()
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            yield from self._fold(
                key, iter(()), timerValues.getCurrentWatermarkInMs()
            )

        def close(self) -> None:
            pass

    return (
        tagged.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .transformWithStateInPandas(
            _AsofProc(),
            out_schema,
            outputMode="Append",
            timeMode="EventTime",
            eventTimeColumnName=ts_col,
        )
    )
