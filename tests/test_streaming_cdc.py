"""Streaming CDC materialization + as-of enrichment: each operator
pinned against its batch twin, out-of-order robustness, tombstone GC,
and checkpoint restart."""

from __future__ import annotations

import datetime as dt
import json
import time

import pytest

CDC_DDL = "user_id long, ts timestamp, seq long, op string, value double"
FACT_DDL = "k long, ts timestamp, qty double"
DIM_DDL = "k long, ts timestamp, rate double"

T0 = dt.datetime(2024, 1, 1)


def _t(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _append(spark, path, ddl, rows):
    spark.createDataFrame(rows, ddl).coalesce(1).write.mode("append").parquet(
        path
    )
    time.sleep(0.05)  # distinct mtimes → deterministic micro-batch order


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _run_cdc(spark, src, ckpt, name, **kw):
    from open_energy_data_server_spark.streaming.cdc import stream_cdc_apply

    stream = spark.readStream.schema(CDC_DDL).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        stream_cdc_apply(stream, ("user_id",), "ts", "seq", "op", **kw)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
        progress = list(q.recentProgress)
    finally:
        q.stop()
    return rows, progress


def test_stream_cdc_apply_matches_batch_snapshot(
    spark, tmp_path, rocksdb_state
):
    """Per-key last emitted row ≡ the batch cdc_current_snapshot
    (keep_deleted) over the full replay — the streaming fold and the
    batch max_by converge on identical state."""
    from open_energy_data_server_spark.operators.cdc import (
        cdc_current_snapshot,
    )

    src = str(tmp_path / "src")
    chunks = [
        [
            (1, _t(0), 1, "I", 10.0),
            (2, _t(1), 2, "I", 20.0),
            (3, _t(2), 3, "I", 30.0),
        ],
        [
            (1, _t(10), 4, "U", 11.0),
            (2, _t(11), 5, "D", None),
            (3, _t(12), 6, "U", 31.0),
        ],
        [
            (1, _t(20), 7, "U", 12.0),
            (3, _t(21), 8, "D", None),
            (2, _t(22), 9, "I", 21.0),  # re-insert after delete
        ],
    ]
    for c in chunks:
        _append(spark, src, CDC_DDL, c)
    rows, _ = _run_cdc(spark, src, str(tmp_path / "ck"), "cdc_m")

    last = {}
    for r in rows:
        if r.user_id not in last or (r.ts, r.seq) > (
            last[r.user_id].ts,
            last[r.user_id].seq,
        ):
            last[r.user_id] = r
    streamed = {
        u: (r.ts, r.seq, r.op, r.value, r.is_deleted)
        for u, r in last.items()
    }

    batch = spark.createDataFrame(
        [r for c in chunks for r in c], CDC_DDL
    )
    expected = {
        r.user_id: (r.ts, r.seq, r.op, r.value, r.op == "D")
        for r in cdc_current_snapshot(
            batch, ["user_id"], "ts", "seq", "op", keep_deleted=True
        ).collect()
    }
    assert streamed == expected
    # and the sink-facing contract: final current values
    assert streamed[1][3] == 12.0 and not streamed[1][4]
    assert streamed[2][3] == 21.0 and not streamed[2][4]
    assert streamed[3][4] is True  # tombstoned


def test_stream_cdc_out_of_order_ignored(spark, tmp_path, rocksdb_state):
    """A late change (within the watermark) that LOSES the (ts, seq)
    comparison neither regresses state nor emits."""
    src = str(tmp_path / "src")
    _append(spark, src, CDC_DDL, [(1, _t(10), 5, "U", 50.0)])
    # late row: only 4 min behind the key's head, watermark is 30 min
    _append(spark, src, CDC_DDL, [(1, _t(6), 4, "U", 40.0)])
    rows, _ = _run_cdc(
        spark, src, str(tmp_path / "ck"), "cdc_ooo", watermark="30 minutes"
    )
    assert len(rows) == 1  # the stale row emitted nothing
    assert rows[0].value == 50.0 and rows[0].seq == 5


def test_stream_cdc_tombstone_gc(spark, tmp_path, rocksdb_state):
    """Deleted keys leave state after tombstone_ttl of event time:
    the state-row count drops back to the live-key count once the
    watermark passes the tombstone's GC timer."""
    src = str(tmp_path / "src")
    _append(
        spark,
        src,
        CDC_DDL,
        [(1, _t(0), 1, "I", 1.0), (2, _t(0), 2, "I", 2.0)],
    )
    _append(spark, src, CDC_DDL, [(2, _t(1), 3, "D", None)])
    # key 1 keeps ticking; watermark (1 min delay) sails past the
    # tombstone's ts+ttl (2 min) ⇒ timer fires ⇒ key 2 state cleared
    _append(spark, src, CDC_DDL, [(1, _t(30), 4, "U", 1.5)])
    rows, progress = _run_cdc(
        spark,
        src,
        str(tmp_path / "ck"),
        "cdc_gc",
        watermark="1 minute",
        tombstone_ttl="2 minutes",
    )
    state_rows = [
        sum(op["numRowsTotal"] for op in p["stateOperators"])
        for p in (json.loads(pr.json) for pr in progress)
        if p.get("stateOperators")
    ]
    assert state_rows, "no state metrics reported"
    assert max(state_rows) >= 2  # both keys held state at the peak
    assert state_rows[-1] == 1  # tombstone GC'd, only key 1 remains


def test_stream_cdc_checkpoint_restart(spark, tmp_path, rocksdb_state):
    """State survives a restart: after recovery the stale comparison
    still works (a pre-crash (ts, seq) wins over an older post-crash
    arrival) and only genuinely newer changes emit."""
    from open_energy_data_server_spark.streaming.cdc import stream_cdc_apply

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(CDC_DDL).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            stream_cdc_apply(
                stream, ("user_id",), "ts", "seq", "op",
                watermark="30 minutes",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.read.parquet(out).collect()

    _append(spark, src, CDC_DDL, [(1, _t(10), 5, "U", 50.0)])
    rows = run_once()
    assert len(rows) == 1

    # crash + new data: one stale row (loses vs recovered state) and
    # one genuinely newer row
    _append(
        spark,
        src,
        CDC_DDL,
        [(1, _t(8), 3, "U", 30.0), (1, _t(20), 9, "U", 90.0)],
    )
    rows2 = run_once()
    new = [(r.seq, r.value) for r in rows2 if r.seq != 5]
    assert new == [(9, 90.0)]


# ---------------------------------------------------------------------------
# as-of enrichment


def _run_asof(spark, fsrc, dsrc, ckpt, name, **kw):
    from open_energy_data_server_spark.streaming.cdc import stream_asof_enrich

    facts = (
        spark.readStream.schema(FACT_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(fsrc)
    )
    dims = (
        spark.readStream.schema(DIM_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(dsrc)
    )
    q = (
        stream_asof_enrich(
            facts, dims, "k", "ts", ["qty"], ["rate"], **kw
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(f"SELECT * FROM {name}").collect()
    finally:
        q.stop()
    return rows


def test_stream_asof_enrich_matches_batch(spark, tmp_path, rocksdb_state):
    """Streaming as-of output ≡ the batch asof_join on the same data,
    for every fact the watermark has passed — including a dim version
    that arrives AFTER facts it must enrich (out-of-order across
    streams, in-order per the watermark contract)."""
    from open_energy_data_server_spark.operators.asof import asof_join

    fsrc, dsrc = str(tmp_path / "f"), str(tmp_path / "d")
    facts = [
        (1, _t(5), 100.0),
        (1, _t(12), 200.0),
        (2, _t(7), 300.0),
        (1, _t(25), 400.0),
    ]
    dims = [
        (1, _t(0), 1.0),
        (1, _t(10), 2.0),
        (2, _t(9), 5.0),  # arrives AFTER fact (2, 07:00) → that fact
        # must still see NO dim (its ts precedes this version)
        (1, _t(24), 3.0),
    ]
    _append(spark, fsrc, FACT_DDL, facts[:3])
    _append(spark, dsrc, DIM_DDL, dims[:2])
    _append(spark, dsrc, DIM_DDL, dims[2:])
    _append(spark, fsrc, FACT_DDL, facts[3:])
    # watermark pusher: unrelated key far in the future drives the
    # watermark past every real fact so all of them flush
    _append(spark, fsrc, FACT_DDL, [(99, _t(300), 0.0)])

    rows = _run_asof(
        spark,
        fsrc,
        dsrc,
        str(tmp_path / "ck"),
        "asof_m",
        watermark="5 minutes",
    )
    streamed = sorted(
        (r.k, r.ts, r.qty, r.rate) for r in rows if r.k != 99
    )

    fdf = spark.createDataFrame(facts, FACT_DDL)
    ddf = spark.createDataFrame(dims, DIM_DDL)
    expected = sorted(
        (r.k, r.ts, r.qty, r.rate)
        for r in asof_join(
            fdf, ddf, "ts", "ts", ["rate"], by=["k"]
        ).collect()
    )
    assert streamed == expected
    # spot-pin the semantics: fact(2,07:00) precedes dim(2,09:00)
    assert [r for r in streamed if r[0] == 2][0][3] is None
    # fact(1,25:00) sees the 24:00 version, not the 10:00 one
    assert [r for r in streamed if r[1] == _t(25)][0][3] == 3.0


def test_stream_asof_exactly_once_across_flushes(
    spark, tmp_path, rocksdb_state
):
    """Facts flush exactly once even when emission happens on a
    timeout (no new input for the key) rather than on arrival."""
    fsrc, dsrc = str(tmp_path / "f"), str(tmp_path / "d")
    _append(spark, fsrc, FACT_DDL, [(1, _t(0), 10.0)])
    _append(spark, dsrc, DIM_DDL, [(1, _t(0), 7.0)])
    # two separate watermark advances, neither adding key-1 input:
    # the pending fact must emit once and only once
    _append(spark, fsrc, FACT_DDL, [(99, _t(60), 0.0)])
    _append(spark, fsrc, FACT_DDL, [(99, _t(120), 0.0)])
    rows = _run_asof(
        spark,
        fsrc,
        dsrc,
        str(tmp_path / "ck"),
        "asof_once",
        watermark="5 minutes",
    )
    mine = [r for r in rows if r.k == 1]
    assert len(mine) == 1
    assert mine[0].qty == 10.0 and mine[0].rate == 7.0


def test_stream_asof_tws_matches_apws(spark, tmp_path, rocksdb_state):
    """The transformWithStateInPandas as-of variant (two ListState
    buffers + explicit event-time timers) is row-for-row equal to the
    applyInPandasWithState variant — same _asof_match fold, two state
    APIs."""
    from open_energy_data_server_spark.streaming.cdc import (
        stream_asof_enrich,
        stream_asof_enrich_tws,
    )

    facts = [
        (1, _t(5), 100.0),
        (1, _t(12), 200.0),
        (2, _t(7), 300.0),
        (1, _t(25), 400.0),
        (99, _t(300), 0.0),  # watermark pusher
    ]
    dims = [
        (1, _t(0), 1.0),
        (1, _t(10), 2.0),
        (2, _t(9), 5.0),
        (1, _t(24), 3.0),
    ]
    results = {}
    for tag, op in (
        ("tws", stream_asof_enrich_tws),
        ("apws", stream_asof_enrich),
    ):
        fsrc, dsrc = str(tmp_path / f"{tag}_f"), str(tmp_path / f"{tag}_d")
        _append(spark, fsrc, FACT_DDL, facts[:3])
        _append(spark, dsrc, DIM_DDL, dims[:2])
        _append(spark, dsrc, DIM_DDL, dims[2:])
        _append(spark, fsrc, FACT_DDL, facts[3:])
        f_stream = (
            spark.readStream.schema(FACT_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(fsrc)
        )
        d_stream = (
            spark.readStream.schema(DIM_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(dsrc)
        )
        q = (
            op(f_stream, d_stream, "k", "ts", ["qty"], ["rate"],
               watermark="5 minutes")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"{tag}_asof")
            .option("checkpointLocation", str(tmp_path / f"{tag}_ck"))
            .start()
        )
        try:
            q.processAllAvailable()
            results[tag] = sorted(
                (r.k, r.ts, r.qty, r.rate)
                for r in spark.sql(f"SELECT * FROM {tag}_asof").collect()
                if r.k != 99
            )
        finally:
            q.stop()
    assert results["tws"] == results["apws"]
    assert len(results["tws"]) == 4  # every real fact flushed, once
    # the fold semantics, spot-pinned through the TWS path:
    assert [r for r in results["tws"] if r[0] == 2][0][3] is None
    assert [r for r in results["tws"] if r[1] == _t(25)][0][3] == 3.0


def test_stream_cdc_randomized_replays_match_batch(
    spark, tmp_path, rocksdb_state
):
    """Seeded randomized sweep: random I/U/D change logs, random
    micro-batch splits, rows shuffled WITHIN each batch (arbitrary
    arrival order inside the watermark) — the streaming fold's final
    state must equal the batch max_by snapshot every time."""
    import random

    from open_energy_data_server_spark.operators.cdc import (
        cdc_current_snapshot,
    )

    for seed in (7, 42, 1337):
        rng = random.Random(seed)
        n_keys, n_changes = 6, 40
        seqs = list(range(n_changes))
        changes = []
        for seq in seqs:
            changes.append(
                (
                    rng.randrange(1, n_keys + 1),
                    _t(seq),  # monotone event time; arrival shuffled below
                    seq,
                    rng.choice(["I", "U", "U", "U", "D"]),
                    round(rng.uniform(0, 100), 2),
                )
            )
        # random contiguous batch splits, then shuffle inside each
        # batch: event time stays within-watermark (30 min) of the
        # batch max, arrival order is arbitrary
        cuts = sorted(rng.sample(range(1, n_changes), 3))
        chunks = [
            changes[a:b]
            for a, b in zip([0] + cuts, cuts + [n_changes])
        ]
        for c in chunks:
            rng.shuffle(c)
        src = str(tmp_path / f"src{seed}")
        for c in chunks:
            _append(spark, src, CDC_DDL, c)
        rows, _ = _run_cdc(
            spark,
            src,
            str(tmp_path / f"ck{seed}"),
            f"cdc_rand{seed}",
            watermark="30 minutes",
        )
        last = {}
        for r in rows:
            if r.user_id not in last or (r.ts, r.seq) > (
                last[r.user_id].ts,
                last[r.user_id].seq,
            ):
                last[r.user_id] = r
        streamed = {
            u: (r.ts, r.seq, r.op, r.value) for u, r in last.items()
        }
        expected = {
            r.user_id: (r.ts, r.seq, r.op, r.value)
            for r in cdc_current_snapshot(
                spark.createDataFrame(changes, CDC_DDL),
                ["user_id"],
                "ts",
                "seq",
                "op",
                keep_deleted=True,
            ).collect()
        }
        assert streamed == expected, f"seed {seed}"
