"""Structured Streaming tests: the window builders under a real
streaming lineage (file source → memory sink), watermark late-data
drop across micro-batches, and the applyInPandasWithState operator."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from open_energy_data_server_spark.streaming.stateful import running_user_stats
from open_energy_data_server_spark.streaming.windows import tumbling_agg

EVENTS_DDL = "event_id long, ts timestamp, user_id long, value double"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.mode("append").parquet(path)


def _rows(hours_minutes, start_id=0):
    t0 = dt.datetime(2024, 1, 1)
    return [
        (start_id + i, t0 + dt.timedelta(hours=h, minutes=m), 1, 1.0)
        for i, (h, m) in enumerate(hours_minutes)
    ]


def test_stream_tumbling_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, _rows([(10, 5), (10, 20), (11, 30), (12, 1)]))
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    agged = tumbling_agg(stream, "ts", "1 hour", watermark="10 minutes")
    q = (
        agged.writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumble_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.window_start), r.n) for r in spark.sql("SELECT * FROM tumble_out").collect()
        }
    finally:
        q.stop()
    batch = tumbling_agg(spark.read.schema(EVENTS_DDL).parquet(src), "ts", "1 hour")
    want = {(str(r.window_start), r.n) for r in batch.collect()}
    assert got == want == {
        ("2024-01-01 10:00:00", 2),
        ("2024-01-01 11:00:00", 1),
        ("2024-01-01 12:00:00", 1),
    }


def test_stream_watermark_drops_late_data(spark, tmp_path):
    """Append mode + 10-minute watermark: a row arriving hours behind
    the stream's max event time must not resurrect its window (T3 —
    the reference's quality-assurance delay as a stream semantic)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, _rows([(10, 0), (10, 30), (11, 10)]))
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    agged = tumbling_agg(stream, "ts", "1 hour", watermark="10 minutes")
    q = (
        agged.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: one very-late row (08:15, far below watermark 11:00)
        # and one new row advancing the stream
        _write_batch(spark, src, _rows([(8, 15), (13, 0)], start_id=100))
        q.processAllAvailable()
        # batch 3: push watermark far ahead so earlier windows finalize
        _write_batch(spark, src, _rows([(18, 0)], start_id=200))
        q.processAllAvailable()
        rows = {str(r.window_start): r.n for r in spark.sql("SELECT * FROM late_out").collect()}
    finally:
        q.stop()
    assert "2024-01-01 08:00:00" not in rows, "late row must be dropped"
    assert rows.get("2024-01-01 10:00:00") == 2


def test_stateful_running_stats(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, dt.datetime(2024, 1, 1, 10), 7, 10.0),
            (2, dt.datetime(2024, 1, 1, 11), 7, 20.0),
            (3, dt.datetime(2024, 1, 1, 10, 30), 8, 5.0),
        ],
    )
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("state_out")
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [(4, dt.datetime(2024, 1, 1, 12), 7, 30.0)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM state_out ORDER BY user_id, n"
        ).collect()
    finally:
        q.stop()
    # user 7: first batch n=2/total=30, after second batch n=3/total=60
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.n, r.total, r.last_value))
    assert by_user[7][-1] == (3, 60.0, 30.0)
    assert by_user[8] == [(1, 5.0, 5.0)]


def test_stream_dedup(spark, tmp_path):
    from open_energy_data_server_spark.streaming.windows import stream_dedup

    src = str(tmp_path / "src")
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 1, 1.0), (1, t0, 1, 1.0), (2, t0 + dt.timedelta(minutes=1), 1, 2.0)]
    _write_batch(spark, src, rows)
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    dedup = stream_dedup(stream.select("event_id", "ts"), ["event_id"], "ts", "10 minutes")
    q = dedup.writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try:
        q.processAllAvailable()
        # re-deliver the same events (at-least-once source) in batch 2
        _write_batch(spark, src, rows)
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) c FROM dedup_out").collect()[0].c
    finally:
        q.stop()
    assert n == 2  # each event_id exactly once across redeliveries


def test_session_agg_batch_path_equals_native(spark):
    """The batch gaps-and-islands strategy must reproduce the native
    session_window operator's output exactly (same merge semantics,
    same gap-extended ends)."""
    import pyspark.sql.functions as F

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.streaming.windows import session_agg

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    fast = session_agg(
        ev, "ts", "7 minutes", keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n"), F.max("value").alias("mx")],
    )
    native = (
        ev.groupBy(F.session_window("ts", "7 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id", "n", "mx",
        )
    )
    assert fast.columns == native.columns
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, native.collect()))


def test_stream_session_agg_matches_batch(spark, tmp_path):
    """session_agg on a real streaming lineage (native session_window
    branch) merges sessions identically to the batch gaps-and-islands
    branch."""
    from open_energy_data_server_spark.streaming.windows import session_agg

    src = str(tmp_path / "src")
    # two sessions for user 1: 10:00-10:08 (gap<10m merges) and 11:00
    _write_batch(spark, src, _rows([(10, 0), (10, 8), (11, 0)]))
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    agged = session_agg(
        stream, "ts", "10 minutes", keys=["user_id"], watermark="5 minutes"
    )
    q = (
        agged.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.session_start), str(r.session_end), r.user_id, r.n)
            for r in spark.sql("SELECT * FROM sess_out").collect()
        }
    finally:
        q.stop()
    batch = session_agg(
        spark.read.schema(EVENTS_DDL).parquet(src), "ts", "10 minutes", keys=["user_id"]
    )
    want = {
        (str(r.session_start), str(r.session_end), r.user_id, r.n)
        for r in batch.collect()
    }
    assert got == want == {
        ("2024-01-01 10:00:00", "2024-01-01 10:18:00", 1, 2),
        ("2024-01-01 11:00:00", "2024-01-01 11:10:00", 1, 1),
    }


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Two watermarked file-source streams joined on user_id with a
    ±30-minute event-time bound; result must equal the identical
    builder run in batch mode (watermarks are no-ops there)."""
    from open_energy_data_server_spark.streaming.joins import stream_stream_join

    meters = str(tmp_path / "meters")
    prices = str(tmp_path / "prices")
    PRICES_DDL = "tick_id long, pts timestamp, user_id long, price double"
    t0 = dt.datetime(2024, 1, 1)
    _write_batch(
        spark,
        meters,
        [
            (1, t0 + dt.timedelta(hours=10), 7, 100.0),
            (2, t0 + dt.timedelta(hours=11), 7, 200.0),
            (3, t0 + dt.timedelta(hours=10, minutes=15), 8, 50.0),
        ],
    )
    spark.createDataFrame(
        [
            (10, t0 + dt.timedelta(hours=10, minutes=10), 7, 1.5),  # ±30m of e1
            (11, t0 + dt.timedelta(hours=12, minutes=45), 7, 2.5),  # matches nothing
            (12, t0 + dt.timedelta(hours=9, minutes=50), 8, 3.5),  # ±30m of e3
        ],
        PRICES_DDL,
    ).coalesce(1).write.mode("append").parquet(prices)

    def build(l, r):
        return stream_stream_join(
            l, r, on=["user_id"], left_ts="ts", right_ts="pts",
            left_watermark="10 minutes", right_watermark="10 minutes",
            lower="30 minutes", upper="30 minutes",
        )

    streamed = build(
        spark.readStream.schema(EVENTS_DDL).parquet(meters),
        spark.readStream.schema(PRICES_DDL).parquet(prices),
    )
    q = (
        streamed.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_id, r.tick_id, r.price)
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        }
    finally:
        q.stop()
    batch = build(
        spark.read.schema(EVENTS_DDL).parquet(meters),
        spark.read.schema(PRICES_DDL).parquet(prices),
    )
    want = {(r.event_id, r.tick_id, r.price) for r in batch.collect()}
    assert got == want == {(1, 10, 1.5), (3, 12, 3.5)}


def test_stream_stream_join_suffixes_collisions(spark):
    """Batch-mode check of the column contract: right 'value' collides
    with left 'value' → 'value_right'; keys appear once."""
    from open_energy_data_server_spark.streaming.joins import stream_stream_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0, 7, 1.0)], EVENTS_DDL)
    right = spark.createDataFrame(
        [(9, t0, 7, 2.0)], "rid long, pts timestamp, user_id long, value double"
    )
    out = stream_stream_join(
        left, right, ["user_id"], "ts", "pts", "1 minute", "1 minute",
        "5 minutes", "5 minutes",
    )
    assert out.columns == ["event_id", "ts", "user_id", "value", "rid", "pts", "value_right"]
    row = out.collect()[0]
    assert (row.value, row.value_right) == (1.0, 2.0)


def test_stateful_ttl_expires_and_restarts(spark, tmp_path):
    """EventTimeTimeout TTL: a key idle past (last event + TTL) emits
    one expired=true tombstone when the watermark passes its deadline,
    and a later event restarts accumulation from zero."""
    from open_energy_data_server_spark.streaming.stateful import running_user_stats_ttl

    src = str(tmp_path / "src")
    _write_batch(
        spark,
        src,
        [
            (1, dt.datetime(2024, 1, 1, 10, 0), 7, 10.0),
            (2, dt.datetime(2024, 1, 1, 10, 30), 8, 5.0),
        ],
    )
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src).withWatermark("ts", "10 minutes")
    q = (
        running_user_stats_ttl(stream, ttl="30 minutes")
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory")
        .queryName("ttl_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # advance watermark to 12:50 — far past both deadlines (10:40 /
        # 11:00) — via a key-7 event; key 8 gets NO data so it times out
        # in the NEXT batch's timeout sweep
        _write_batch(spark, src, [(3, dt.datetime(2024, 1, 1, 13, 0), 7, 30.0)])
        q.processAllAvailable()
        _write_batch(spark, src, [(4, dt.datetime(2024, 1, 1, 13, 10), 9, 1.0)])
        q.processAllAvailable()
        # fresh key-8 event after expiry → restarted accumulation
        _write_batch(spark, src, [(5, dt.datetime(2024, 1, 1, 13, 30), 8, 2.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM ttl_out ORDER BY user_id, n").collect()
    finally:
        q.stop()
    eights = [(r.n, r.total, r.expired) for r in rows if r.user_id == 8]
    assert (1, 5.0, True) in eights, f"expected tombstone, got {eights}"
    assert (1, 2.0, False) in eights, f"expected fresh restart, got {eights}"
    # the tombstone carries the pre-expiry totals exactly once
    assert eights.count((1, 5.0, True)) == 1


def test_stateful_ttl_out_of_order_event_keeps_newest(spark, tmp_path):
    """A late-but-valid OLDER event (above watermark) must neither
    overwrite last_value nor drag the TTL deadline backwards — the
    newest-event-time rule, kept in state across batches."""
    from open_energy_data_server_spark.streaming.stateful import running_user_stats_ttl

    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, dt.datetime(2024, 1, 1, 13, 0), 7, 30.0)])
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src).withWatermark("ts", "10 minutes")
    q = (
        running_user_stats_ttl(stream, ttl="30 minutes")
        .writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory")
        .queryName("ttl_ooo")
        .start()
    )
    try:
        q.processAllAvailable()
        # older event at 12:55 — above the 12:50 watermark so it is NOT
        # late-filtered, but older than the 13:00 state
        _write_batch(spark, src, [(2, dt.datetime(2024, 1, 1, 12, 55), 7, 99.0)])
        q.processAllAvailable()
        rows = [
            (r.n, r.last_value, r.expired)
            for r in spark.sql("SELECT * FROM ttl_ooo WHERE user_id = 7 ORDER BY n").collect()
        ]
    finally:
        q.stop()
    # both events counted, but last_value stays the 13:00 reading
    assert rows[-1] == (2, 30.0, False), rows


def test_stream_stream_join_compound_interval_falls_back(spark):
    """Compound interval strings aren't bucket-parseable — the batch
    path must fall back to the plain join, not crash."""
    from open_energy_data_server_spark.streaming.joins import stream_stream_join

    t0 = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([(1, t0, 7, 1.0)], EVENTS_DDL)
    right = spark.createDataFrame(
        [(9, t0 + dt.timedelta(minutes=70), 7, 2.0)],
        "rid long, pts timestamp, user_id long, price double",
    )
    out = stream_stream_join(
        left, right, ["user_id"], "ts", "pts", "1 minute", "1 minute",
        "1 hour 30 minutes", "1 hour 30 minutes",
    )
    assert [(r.event_id, r.rid) for r in out.collect()] == [(1, 9)]


def test_foreachbatch_ledger_sink_exactly_once(spark, tmp_path):
    """BatchIdLedgerSink: per-batch-id overwrite + write-then-publish
    manifest — a replayed micro-batch (foreachBatch's at-least-once
    contract) replaces its own output instead of duplicating it."""
    from open_energy_data_server_spark.streaming.sinks import BatchIdLedgerSink

    src = str(tmp_path / "src")
    sink = BatchIdLedgerSink(str(tmp_path / "lake"))
    _write_batch(spark, src, _rows([(0, 0), (0, 30)]))
    stream = spark.readStream.schema(EVENTS_DDL).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sink.committed() == [0]
    assert sink.read(spark).count() == 2

    # crash-replay simulation: deliver batch 0 AGAIN (same data, same
    # id) — the idempotent overwrite must leave exactly 2 rows
    batch0 = spark.createDataFrame(_rows([(0, 0), (0, 30)]), EVENTS_DDL)
    sink.apply(batch0, 0)
    assert sink.committed() == [0]
    assert sink.read(spark).count() == 2

    # a second real batch appends under its own id
    _write_batch(spark, src, _rows([(1, 0)], start_id=10))
    q = (
        spark.readStream.schema(EVENTS_DDL)
        .parquet(src)
        .writeStream.foreachBatch(sink.apply)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert sink.committed() == [0, 1]
    assert sink.read(spark).count() == 3


def test_foreachbatch_uncommitted_batch_invisible(spark, tmp_path):
    """Write-then-publish: data written without its manifest marker
    (crash before the commit point) is excluded from committed reads
    but present in the raw lake."""
    from open_energy_data_server_spark.streaming.sinks import BatchIdLedgerSink

    sink = BatchIdLedgerSink(str(tmp_path / "lake"))
    batch = spark.createDataFrame(_rows([(0, 0)]), EVENTS_DDL)
    # simulate the crash: data lands, publish never happens
    batch.write.mode("overwrite").parquet(str(tmp_path / "lake" / "batch_id=5"))
    assert sink.committed(spark) == []
    assert sink.read(spark).count() == 0
    assert sink.read(spark, committed_only=False).count() == 1
    # replay completes the delivery; the batch becomes visible
    sink.apply(batch, 5)
    assert sink.committed() == [5]
    assert sink.read(spark).count() == 1


def test_ledger_sink_empty_lake_reads_empty(spark, tmp_path):
    """read() on a lake with no batch_id=* directories (stream never
    started) returns an empty DataFrame instead of raising the glob's
    path-not-found."""
    from open_energy_data_server_spark.streaming.sinks import BatchIdLedgerSink

    sink = BatchIdLedgerSink(str(tmp_path / "never-written"))
    assert sink.read(spark).count() == 0
    # root exists but holds no batch dirs: same contract
    root = tmp_path / "empty-root"
    root.mkdir()
    assert BatchIdLedgerSink(str(root)).read(spark).count() == 0


def test_foreachbatch_scd2_maintenance(spark, tmp_path):
    """Streaming dimension maintenance: a change stream folded into an
    SCD2 history with scd2_apply per micro-batch must converge to the
    same table as a one-shot scd2_history over all observations."""
    from open_energy_data_server_spark.operators.scd import (
        scd2_apply,
        scd2_history,
    )

    ddl = "k long, ts timestamp, attr string"
    t0 = dt.datetime(2024, 1, 1)
    all_rows = [
        (1, t0, "a"),
        (1, t0 + dt.timedelta(days=1), "b"),
        (2, t0 + dt.timedelta(hours=3), "x"),
        (1, t0 + dt.timedelta(days=2), "b"),   # repeat: collapses
        (1, t0 + dt.timedelta(days=3), "c"),
        (3, t0 + dt.timedelta(days=3), "n"),   # new key mid-stream
    ]
    batches = [all_rows[:3], all_rows[3:]]

    src = str(tmp_path / "src")
    hist_path = str(tmp_path / "hist")

    def fold(batch_df, batch_id):
        spark_ = batch_df.sparkSession
        try:
            hist = spark_.read.parquet(hist_path)
            new_hist = scd2_apply(hist, batch_df, ["k"], "ts", ["attr"])
        except Exception:  # first batch: no history yet
            new_hist = scd2_history(batch_df, ["k"], "ts", ["attr"])
        # collect-then-overwrite: the history is dimension-sized (small
        # relative to the stream); a production lake would version it
        rows = new_hist.collect()
        spark_.createDataFrame(rows, new_hist.schema).write.mode(
            "overwrite"
        ).parquet(hist_path)

    for batch in batches:
        spark.createDataFrame(batch, ddl).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q = (
            spark.readStream.schema(ddl)
            .parquet(src)
            .writeStream.foreachBatch(fold)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def canon(df):
        return sorted(
            (r["k"], r["attr"], r["valid_from"], r["valid_to"],
             r["is_current"], r["version"])
            for r in df.collect()
        )

    expected = canon(
        scd2_history(spark.createDataFrame(all_rows, ddl), ["k"], "ts", ["attr"])
    )
    got = canon(spark.read.parquet(hist_path))
    assert got == expected


def test_ledger_sink_time_travel(spark, tmp_path):
    """as_of_batch reads the lake exactly as it stood after that batch
    committed — the append-only ledger's snapshot-read property."""
    from open_energy_data_server_spark.streaming.sinks import BatchIdLedgerSink

    sink = BatchIdLedgerSink(str(tmp_path / "lake"))
    for bid, n in ((0, 2), (1, 3), (2, 1)):
        sink.apply(
            spark.createDataFrame(_rows([(0, i) for i in range(n)],
                                        start_id=bid * 10), EVENTS_DDL),
            bid,
        )
    assert sink.read(spark).count() == 6
    assert sink.read(spark, as_of_batch=0).count() == 2
    assert sink.read(spark, as_of_batch=1).count() == 5
    assert sink.read(spark, as_of_batch=99).count() == 6
    ids = {r["batch_id"] for r in sink.read(spark, as_of_batch=1).collect()}
    assert ids == {0, 1}


def test_stream_interval_coalescer(spark, tmp_path):
    """Streaming interval coalescing: overlapping incident windows
    merge in state; a window closes when a later interval jumps past
    it (new_window) or when the watermark passes its end (timeout)."""
    from open_energy_data_server_spark.streaming.stateful import interval_coalescer

    IV_DDL = "user_id long, s timestamp, e timestamp"
    src = str(tmp_path / "iv_src")
    t0 = dt.datetime(2024, 1, 1)

    def iv(uid, start_min, end_min):
        return (
            uid,
            t0 + dt.timedelta(minutes=start_min),
            t0 + dt.timedelta(minutes=end_min),
        )

    # batch 1: user 1 has two overlapping windows + one contained one
    spark.createDataFrame(
        [iv(1, 0, 30), iv(1, 20, 50), iv(1, 25, 28)], IV_DDL
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(IV_DDL).parquet(src)
    out = interval_coalescer(stream, watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("coalesce_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # the merged window is still OPEN: nothing emitted yet
        assert spark.sql("SELECT * FROM coalesce_out").count() == 0

        # batch 2: a later window for user 1 closes the merged one
        spark.createDataFrame([iv(1, 120, 130)], IV_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM coalesce_out").collect()
        assert len(rows) == 1
        r = rows[0]
        assert (
            r.user_id,
            str(r.window_start),
            str(r.window_end),
            r.n_raw,
            r.closed_by,
        ) == (1, "2024-01-01 00:00:00", "2024-01-01 00:50:00", 3, "new_window")

        # batch 3: another user far in the future drags the watermark
        # past user 1's open window end -> timeout closure
        spark.createDataFrame([iv(2, 600, 610)], IV_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        # one more (possibly empty) trigger lets the timeout fire
        spark.createDataFrame([iv(2, 620, 630)], IV_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        closed = {
            (r.user_id, str(r.window_start), r.n_raw, r.closed_by)
            for r in spark.sql("SELECT * FROM coalesce_out").collect()
        }
        assert (1, "2024-01-01 02:00:00", 1, "timeout") in closed
    finally:
        q.stop()


def test_stream_interval_coalescer_checkpoint_restart(spark, tmp_path):
    """Crash-replay: stop the coalescer mid-incident, restart from the
    checkpoint, and the OPEN window state survives — the closing
    interval after restart emits the same merged window a continuous
    run would."""
    from open_energy_data_server_spark.streaming.stateful import interval_coalescer

    IV_DDL = "user_id long, s timestamp, e timestamp"
    src = str(tmp_path / "iv_src2")
    ckpt = str(tmp_path / "iv_ckpt")
    t0 = dt.datetime(2024, 1, 1)

    def iv(uid, start_min, end_min):
        return (
            uid,
            t0 + dt.timedelta(minutes=start_min),
            t0 + dt.timedelta(minutes=end_min),
        )

    out_dir = str(tmp_path / "iv_out")

    def start():
        # memory sink cannot recover from a checkpoint; the file sink
        # is the fault-tolerant one
        stream = spark.readStream.schema(IV_DDL).parquet(src)
        return (
            interval_coalescer(stream, watermark="10 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    spark.createDataFrame([iv(1, 0, 30), iv(1, 10, 45)], IV_DDL).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        assert spark.read.parquet(out_dir).count() == 0
    finally:
        q.stop()  # crash point: the merged window [0, 45) is open state

    spark.createDataFrame([iv(1, 200, 210)], IV_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        rows = spark.read.parquet(out_dir).collect()
        assert [
            (r.user_id, str(r.window_start), str(r.window_end), r.n_raw, r.closed_by)
            for r in rows
        ] == [(1, "2024-01-01 00:00:00", "2024-01-01 00:45:00", 2, "new_window")]
    finally:
        q.stop()


DOC_DDL = "doc_id string, ts timestamp, text string"


def _doc(doc_id, minute, text):
    return (doc_id, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute), text)


_LOREM = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill with great interest today"
)


def test_stream_minhash_dedup_and_eviction(spark, tmp_path):
    """Streaming minhash dedup: an identical re-delivery inside the
    watermark horizon is dropped; beyond the horizon the signature
    state has been EVICTED and the same content passes again —
    bounded state, the property plain dropDuplicates cannot give."""
    from open_energy_data_server_spark.streaming.dedup import stream_minhash_dedup

    src = str(tmp_path / "docs_src")
    spark.createDataFrame(
        [
            _doc("a1", 0, _LOREM),
            _doc("a2", 1, _LOREM),  # verbatim duplicate, in horizon
            _doc("b1", 2, "completely different short corpus of words here"),
        ],
        DOC_DDL,
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOC_DDL).parquet(src)
    out = stream_minhash_dedup(stream, "text", "ts", watermark="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("mh_dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql("SELECT * FROM mh_dedup_out").collect()}
        assert ids == {"a1", "b1"}

        # advance the watermark far past the horizon, then re-deliver
        spark.createDataFrame(
            [_doc("wm", 300, "watermark mover event text")], DOC_DDL
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame(
            [_doc("a3", 301, _LOREM)], DOC_DDL
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql("SELECT * FROM mh_dedup_out").collect()}
        assert "a3" in ids  # state evicted → old content admissible again
    finally:
        q.stop()


def test_stream_minhash_signature_matches_batch(spark):
    """A document's streaming signature IS its batch signature (same
    base hash, same affine maps) — the two pipelines agree on what a
    near-dup is."""
    from open_energy_data_server_spark.operators.dedup_text import minhash_wide
    from open_energy_data_server_spark.streaming.dedup import (
        _minhash_sig_col,
        _with_minhash,
    )

    df = spark.createDataFrame(
        [_doc("d1", 0, _LOREM), _doc("d2", 1, "tiny")], DOC_DDL
    )
    got = {
        r.doc_id: r.sig
        for r in _with_minhash(df, "text", 16, 3)
        .withColumn("sig", _minhash_sig_col("text", 16))
        .select("doc_id", "sig")
        .collect()
    }
    wide = minhash_wide(df, "doc_id", "text", 16).collect()
    batch_sig = {
        r.doc: ",".join(str(r[f"mh{i}"]) for i in range(16)) for r in wide
    }
    assert got["d1"] == batch_sig["d1"]
    assert got["d2"].startswith("raw:")  # <3 tokens: content-hash fallback
    assert "d2" not in batch_sig  # batch path drops unshingleable docs


def test_stream_content_dedup_exact(spark, tmp_path):
    from open_energy_data_server_spark.streaming.dedup import stream_content_dedup

    src = str(tmp_path / "cd_src")
    spark.createDataFrame(
        [
            _doc("x1", 0, "Same   Text"),
            _doc("x2", 1, "same text"),  # normalized-equal → dropped
            _doc("y1", 2, "other text"),
        ],
        DOC_DDL,
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOC_DDL).parquet(src)
    q = (
        stream_content_dedup(stream, "text", "ts", "10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cd_out")
        .start()
    )
    try:
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql("SELECT * FROM cd_out").collect()}
        assert ids == {"x1", "y1"}
    finally:
        q.stop()


def test_stream_dedup_null_text_passes_through(spark, tmp_path):
    """NULL-text rows must NOT collapse into one survivor: a NULL key
    concat yields NULL and dropDuplicatesWithinWatermark treats NULL
    as a single value (round-9 ADVICE). Both dedup operators coalesce
    the key to a per-row token — all null-text rows survive, while
    real duplicates still drop."""
    from open_energy_data_server_spark.streaming.dedup import (
        stream_content_dedup,
        stream_minhash_dedup,
    )

    rows = [
        _doc("n1", 0, None),
        _doc("n2", 1, None),  # second null-text row: must ALSO survive
        _doc("x1", 2, "same text"),
        _doc("x2", 3, "same   TEXT"),  # real dup: dropped
    ]
    for tag, op in (
        ("cdnull", lambda s: stream_content_dedup(s, "text", "ts", "10 minutes", id_col="doc_id")),
        ("mhnull", lambda s: stream_minhash_dedup(s, "text", "ts", "10 minutes", id_col="doc_id")),
    ):
        src = str(tmp_path / f"{tag}_src")
        spark.createDataFrame(rows, DOC_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(DOC_DDL).parquet(src)
        q = (
            op(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"{tag}_out")
            .start()
        )
        try:
            q.processAllAvailable()
            ids = {r.doc_id for r in spark.sql(f"SELECT * FROM {tag}_out").collect()}
            assert ids == {"n1", "n2", "x1"}, (tag, ids)
        finally:
            q.stop()


def test_stream_lsh_candidates_and_owner_eviction(spark, tmp_path):
    """Band-bucket owners emit candidates for later near-dup arrivals
    (≥1 shared band), unrelated docs emit nothing, and owners age out
    by event-time timeout — a beyond-horizon re-arrival becomes the
    new owner instead of emitting against a stale one."""
    from open_energy_data_server_spark.streaming.dedup import stream_lsh_candidates

    src = str(tmp_path / "lsh_src")
    near = _LOREM.replace("today", "tonight")  # one token changed
    spark.createDataFrame(
        [_doc("own", 0, _LOREM), _doc("dup", 1, near)],
        DOC_DDL,
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOC_DDL).parquet(src)
    out = stream_lsh_candidates(
        stream, "doc_id", "text", "ts", watermark="10 minutes"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("lsh_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM lsh_out").collect()
        assert rows, "near-dup shares no band with its template"
        assert {(r.doc, r.owner_doc) for r in rows} == {("dup", "own")}
        n_bands_hit = len({r.band for r in rows})
        assert 1 <= n_bands_hit <= 8

        # unrelated doc: no candidates
        spark.createDataFrame(
            [_doc("solo", 2, "entirely unrelated words about marine biology")],
            DOC_DDL,
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert {
            (r.doc, r.owner_doc)
            for r in spark.sql("SELECT * FROM lsh_out").collect()
        } == {("dup", "own")}

        # advance the watermark far past the horizon (owner evicted),
        # then replay the template: it becomes the new owner silently
        spark.createDataFrame(
            [_doc("wm", 300, "watermark mover for the lsh stream")], DOC_DDL
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        spark.createDataFrame(
            [_doc("own2", 301, _LOREM)], DOC_DDL
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        cands = {
            (r.doc, r.owner_doc)
            for r in spark.sql("SELECT * FROM lsh_out").collect()
        }
        assert ("own2", "own") not in cands  # stale owner was evicted
        # and a fresh near-dup pairs against the NEW owner
        spark.createDataFrame(
            [_doc("dup2", 302, near)], DOC_DDL
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        cands = {
            (r.doc, r.owner_doc)
            for r in spark.sql("SELECT * FROM lsh_out").collect()
        }
        assert ("dup2", "own2") in cands
    finally:
        q.stop()


def test_stream_minhash_dedup_checkpoint_restart(spark, tmp_path):
    """Crash-replay: signature state survives a checkpoint restart —
    a duplicate delivered AFTER the restart is still dropped (file
    sink; the memory sink cannot recover)."""
    from open_energy_data_server_spark.streaming.dedup import stream_minhash_dedup

    src = str(tmp_path / "mh_src2")
    ckpt = str(tmp_path / "mh_ckpt")
    out_dir = str(tmp_path / "mh_out")

    def start():
        stream = spark.readStream.schema(DOC_DDL).parquet(src)
        return (
            stream_minhash_dedup(stream, "text", "ts", watermark="10 minutes")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    spark.createDataFrame([_doc("a1", 0, _LOREM)], DOC_DDL).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # crash point: a1's signature is in state

    spark.createDataFrame(
        [_doc("a2", 1, _LOREM), _doc("b1", 2, "fresh content after restart")],
        DOC_DDL,
    ).coalesce(1).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        ids = sorted(r.doc_id for r in spark.read.parquet(out_dir).collect())
        assert ids == ["a1", "b1"]  # a2 deduped against recovered state
    finally:
        q.stop()


def test_stream_lsh_candidates_checkpoint_restart(spark, tmp_path):
    """Crash-replay: bucket-owner state survives a restart — a
    near-dup delivered after the crash still pairs against the
    pre-crash owner."""
    from open_energy_data_server_spark.streaming.dedup import stream_lsh_candidates

    src = str(tmp_path / "lsh_src2")
    ckpt = str(tmp_path / "lsh_ckpt")
    out_dir = str(tmp_path / "lsh_out2")
    near = _LOREM.replace("today", "tonight")

    def start():
        stream = spark.readStream.schema(DOC_DDL).parquet(src)
        return (
            stream_lsh_candidates(
                stream, "doc_id", "text", "ts", watermark="10 minutes"
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    spark.createDataFrame([_doc("own", 0, _LOREM)], DOC_DDL).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # crash point: 'own' holds all its band buckets

    spark.createDataFrame([_doc("dup", 1, near)], DOC_DDL).coalesce(
        1
    ).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        rows = spark.read.parquet(out_dir).collect()
        assert rows and {(r.doc, r.owner_doc) for r in rows} == {("dup", "own")}
    finally:
        q.stop()


EV_DDL = "user_id long, ts timestamp, value double"


def test_stream_ewma_anomaly(spark, tmp_path):
    """Per-key EWMA z-scoring: a spike against a settled baseline
    flags; the warmup window never flags; per-key state is
    independent (another key's spike doesn't move this key's
    baseline)."""
    from open_energy_data_server_spark.streaming.anomaly import (
        stream_ewma_anomaly,
    )

    src = str(tmp_path / "anom_src")
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(minutes=i), 10.0 + 0.01 * i) for i in range(12)]
    rows += [(2, t0 + dt.timedelta(minutes=i), 50.0) for i in range(12)]
    rows.append((1, t0 + dt.timedelta(minutes=12), 500.0))  # spike on key 1
    rows.append((2, t0 + dt.timedelta(minutes=12), 50.0))  # key 2 stays calm
    spark.createDataFrame(rows, EV_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(EV_DDL).parquet(src)
    out = stream_ewma_anomaly(stream, watermark="5 minutes", warmup=5)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("anom_out")
        .start()
    )
    try:
        q.processAllAvailable()
        res = spark.sql("SELECT * FROM anom_out").collect()
        assert len(res) == len(rows)
        flagged = {(r.user_id, str(r.ts)) for r in res if r.is_anomaly}
        assert flagged == {(1, "2024-01-01 00:12:00")}
        # warmup rows carry no score
        assert all(r.z is None for r in res if r.n_seen < 5)
        # constant series never flags and its z stays None (ewvar 0)
        assert all(not r.is_anomaly for r in res if r.user_id == 2)
    finally:
        q.stop()


def test_stream_ewma_anomaly_checkpoint_restart(spark, tmp_path):
    """The running EWMA/variance state survives a restart: the spike
    delivered after the crash is judged against the PRE-crash
    baseline (file sink)."""
    from open_energy_data_server_spark.streaming.anomaly import (
        stream_ewma_anomaly,
    )

    src = str(tmp_path / "anom_src2")
    ckpt = str(tmp_path / "anom_ckpt")
    out_dir = str(tmp_path / "anom_out2")
    t0 = dt.datetime(2024, 1, 1)

    def start():
        stream = spark.readStream.schema(EV_DDL).parquet(src)
        return (
            stream_ewma_anomaly(stream, watermark="5 minutes", warmup=5)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    base = [(1, t0 + dt.timedelta(minutes=i), 10.0) for i in range(10)]
    spark.createDataFrame(base, EV_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # crash point: baseline ewma ≈ 10 is in state

    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=10), 400.0)], EV_DDL
    ).coalesce(1).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        rows = {
            str(r.ts): (r.is_anomaly, r.n_seen)
            for r in spark.read.parquet(out_dir).collect()
            if r.user_id == 1
        }
        # the post-restart spike was scored against recovered state
        assert rows["2024-01-01 00:10:00"][0] is True
        assert rows["2024-01-01 00:10:00"][1] == 10
    finally:
        q.stop()


@pytest.fixture()
def rocksdb_state(spark):
    """transformWithState needs the RocksDB provider (the only one
    implementing TWS column families); restore the default after."""
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


def test_stream_ewma_anomaly_tws_executes_and_matches_apws(
    spark, tmp_path, rocksdb_state
):
    """The transformWithStateInPandas variant EXECUTES (vendored
    mini-protobuf runtime drives the Python↔JVM state protocol when
    the real package is absent) and its output is row-for-row equal to
    the applyInPandasWithState variant — same scoring fold, two state
    APIs."""
    from open_energy_data_server_spark.streaming.anomaly import (
        stream_ewma_anomaly,
        stream_ewma_anomaly_tws,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(minutes=i), 10.0) for i in range(10)] + [
        (1, t0 + dt.timedelta(minutes=10), 400.0),
        (2, t0 + dt.timedelta(minutes=3), 5.0),
    ]
    results = {}
    for tag, op in (("tws", stream_ewma_anomaly_tws), ("apws", stream_ewma_anomaly)):
        src = str(tmp_path / f"{tag}_src")
        spark.createDataFrame(rows, EV_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(EV_DDL).parquet(src)
        q = (
            op(stream, watermark="5 minutes", warmup=5)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(f"{tag}_ewma_out")
            .option("checkpointLocation", str(tmp_path / f"{tag}_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            results[tag] = sorted(
                (r.user_id, str(r.ts), r.value,
                 None if r.z is None else round(r.z, 9), r.is_anomaly,
                 r.n_seen)
                for r in spark.sql(f"SELECT * FROM {tag}_ewma_out").collect()
            )
        finally:
            q.stop()
    assert len(results["tws"]) == len(rows)
    assert results["tws"] == results["apws"]
    spike = [r for r in results["tws"] if r[2] == 400.0][0]
    assert spike[4] is True  # anomaly flagged through the TWS path


def test_stream_ewma_anomaly_tws_checkpoint_restart(
    spark, tmp_path, rocksdb_state
):
    """TWS ValueState survives a restart (RocksDB checkpoint): the
    post-crash spike is judged against the PRE-crash baseline."""
    from open_energy_data_server_spark.streaming.anomaly import (
        stream_ewma_anomaly_tws,
    )

    src = str(tmp_path / "tws_src2")
    ckpt = str(tmp_path / "tws_ckpt2")
    out_dir = str(tmp_path / "tws_out2")
    t0 = dt.datetime(2024, 1, 1)

    def start():
        stream = spark.readStream.schema(EV_DDL).parquet(src)
        return (
            stream_ewma_anomaly_tws(stream, watermark="5 minutes", warmup=5)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .start()
        )

    base = [(1, t0 + dt.timedelta(minutes=i), 10.0) for i in range(10)]
    spark.createDataFrame(base, EV_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # crash point: baseline ewma ≈ 10 is in RocksDB state

    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=10), 400.0)], EV_DDL
    ).coalesce(1).write.mode("append").parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        rows = {
            str(r.ts): (r.is_anomaly, r.n_seen)
            for r in spark.read.parquet(out_dir).collect()
            if r.user_id == 1
        }
        assert rows["2024-01-01 00:10:00"][0] is True
        assert rows["2024-01-01 00:10:00"][1] == 10
    finally:
        q.stop()


def test_stream_ewma_anomaly_tws_timer_evicts_state(
    spark, tmp_path, rocksdb_state
):
    """The event-time timer clears idle keys: after a gap past the
    TTL, the key's history restarts (n_seen back to 1) — state is
    bounded for an unbounded stream."""
    from open_energy_data_server_spark.streaming.anomaly import (
        stream_ewma_anomaly_tws,
    )

    src = str(tmp_path / "tws_src3")
    t0 = dt.datetime(2024, 1, 1)
    stream_def = None

    def start():
        stream = spark.readStream.schema(EV_DDL).parquet(src)
        return (
            stream_ewma_anomaly_tws(
                stream, watermark="1 minutes", warmup=3, ttl="10 minutes"
            )
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("tws_evict_out")
            .option("checkpointLocation", str(tmp_path / "tws_ckpt3"))
            .start()
        )

    batches = [
        [(1, t0 + dt.timedelta(minutes=i), 10.0) for i in range(5)],
        # jump far past last_event + ttl → watermark passes the
        # timer, handleExpiredTimer clears the key's state
        [(2, t0 + dt.timedelta(minutes=60), 1.0)],
        [(1, t0 + dt.timedelta(minutes=61), 10.0)],
    ]
    spark.createDataFrame(batches[0], EV_DDL).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    q = start()
    try:
        q.processAllAvailable()
        for batch in batches[1:]:
            spark.createDataFrame(batch, EV_DDL).coalesce(1).write.mode(
                "append"
            ).parquet(src)
            q.processAllAvailable()
        rows = {
            str(r.ts): r.n_seen
            for r in spark.sql("SELECT * FROM tws_evict_out").collect()
            if r.user_id == 1
        }
        # n_seen counts PRIOR events for the key (0-based)
        assert rows["2024-01-01 00:04:00"] == 4
        # state was evicted by the timer: the post-gap row restarts at
        # 0 (it would read 5 had the pre-gap history survived)
        assert rows["2024-01-01 01:01:00"] == 0
    finally:
        q.stop()


def test_stream_curation_pipeline_chained_stateful(spark, tmp_path):
    """The streaming curation composition: quality gate → exact
    content dedup → minhash near-dup dedup as ONE query — two
    dropDuplicatesWithinWatermark operators CHAINED behind a filter
    (Spark 4 multi-stateful-operator support in append mode). A short
    junk doc is gated out, a verbatim re-delivery dies at the content
    stage, a whitespace-variant copy dies at the content stage too
    (normalized fingerprint), and a one-token-different near-dup that
    shares the full signature... passes minhash only if its signature
    differs — asserted both ways."""
    from open_energy_data_server_spark.streaming.dedup import (
        stream_content_dedup,
        stream_minhash_dedup,
    )

    src = str(tmp_path / "cur_src")
    spark.createDataFrame(
        [
            _doc("keep", 0, _LOREM),
            _doc("junk", 1, "too short"),  # gated: < 5 tokens
            _doc("copy", 2, _LOREM),  # exact dup → content stage
            _doc("wsvar", 3, _LOREM.replace(" ", "   ")),  # normalized dup
            _doc("other", 4, "a completely different longer document "
                             "about something else entirely here"),
        ],
        DOC_DDL,
    ).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(DOC_DDL).parquet(src)
    gated = stream.filter(F.size(F.split(F.col("text"), r"\s+")) >= 5)
    deduped = stream_content_dedup(gated, "text", "ts", "10 minutes")
    curated = stream_minhash_dedup(
        deduped.drop("content_fp"), "text", "ts", watermark=None
    )
    q = (
        curated.writeStream.outputMode("append")
        .format("memory")
        .queryName("curated_out")
        .start()
    )
    try:
        q.processAllAvailable()
        ids = {r.doc_id for r in spark.sql("SELECT * FROM curated_out").collect()}
        assert ids == {"keep", "other"}
    finally:
        q.stop()


def test_stream_dedup_into_ledger_sink_e2e(spark, tmp_path):
    """The production ingest shape end-to-end: minhash-deduped stream
    → BatchIdLedgerSink (foreachBatch exactly-once). The dedup state
    lives in the streaming checkpoint, the sink's ledger makes the
    lake idempotent — a full restart with the same checkpoint
    delivers each surviving document exactly once to the lake."""
    from open_energy_data_server_spark.streaming.dedup import stream_minhash_dedup
    from open_energy_data_server_spark.streaming.sinks import BatchIdLedgerSink

    src = str(tmp_path / "dl_src")
    ckpt = str(tmp_path / "dl_ck")
    sink = BatchIdLedgerSink(str(tmp_path / "dl_lake"))

    def run_once():
        stream = spark.readStream.schema(DOC_DDL).parquet(src)
        q = (
            stream_minhash_dedup(stream, "text", "ts", "10 minutes")
            .writeStream.foreachBatch(sink.apply)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(
        [_doc("a1", 0, _LOREM), _doc("a2", 1, _LOREM)], DOC_DDL
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    lake = sink.read(spark)
    assert [r.doc_id for r in lake.collect()] == ["a1"]  # dup dropped pre-sink

    # batch 2 after a full restart: a re-delivery (state-recovered
    # drop) plus fresh content
    spark.createDataFrame(
        [_doc("a3", 2, _LOREM), _doc("b1", 3, "completely different words")],
        DOC_DDL,
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    ids = sorted(r.doc_id for r in sink.read(spark).collect())
    assert ids == ["a1", "b1"]
    assert len(sink.committed()) >= 2


def test_size_state_partitions_derives_from_volume(spark):
    """State partitions derive from per-trigger volume (bounded by
    session parallelism), not the core count — and the env override
    wins."""
    import os

    from open_energy_data_server_spark.streaming import size_state_partitions

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        par = spark.sparkContext.defaultParallelism
        assert size_state_partitions(spark, 5_000) == max(2, min(par, 5))
        assert int(spark.conf.get("spark.sql.shuffle.partitions")) == max(
            2, min(par, 5)
        )
        assert size_state_partitions(spark, 10_000_000) == par
        assert size_state_partitions(spark, 0) == 2
        os.environ["SPARK_OEDS_STREAM_STATE_PARTITIONS"] = "7"
        try:
            assert size_state_partitions(spark, 10_000_000) == 7
        finally:
            del os.environ["SPARK_OEDS_STREAM_STATE_PARTITIONS"]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
