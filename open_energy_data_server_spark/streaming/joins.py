"""Stream-stream joins with watermarked state cleanup (SURVEY §2.9
depth — the streaming form of the J1/J6 batch enrichment joins).

A stream-stream equi-join buffers BOTH sides in state; without a time
bound that state grows with the whole stream. The builder therefore
requires watermarks on both inputs and an event-time interval relating
the two timestamps — together they let Spark evict buffered rows once
the watermark passes the interval's reach, so state is bounded by
(watermark delay + interval width) × arrival rate, the only shape that
survives a 100 TB/day firehose.

Models the reference's price-enrichment joins (e.g. joining market
results onto metered series, /root/reference/crawler/opec.py:78-86)
as continuous pipelines instead of repeated batch re-reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    left_watermark: str,
    right_watermark: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` plus the event-time bound
    ``right_ts ∈ [left_ts − lower, left_ts + upper]``.

    Works identically on batch frames (watermarks are no-ops there) —
    the tests compare the streaming result against the same builder run
    in batch mode. Right-side columns colliding with left names are
    suffixed ``_right`` (chained until free, like operators.asof).
    ``how``: inner / leftOuter / rightOuter / fullOuter — outer joins
    emit the unmatched side only after the watermark closes its
    interval, which is exactly the late-data policy T3 encodes.
    """
    if left_ts in on or right_ts in on:
        raise ValueError("time columns must not be join keys — use the interval bound")
    l_wm = left.withWatermark(left_ts, left_watermark) if left.isStreaming else left
    r_wm = right.withWatermark(right_ts, right_watermark) if right.isStreaming else right

    key_cond = " AND ".join(f"__l.{k} <=> __r.{k}" for k in on) if on else "true"
    time_cond = (
        f"__r.{right_ts} >= __l.{left_ts} - INTERVAL {lower} AND "
        f"__r.{right_ts} <= __l.{left_ts} + INTERVAL {upper}"
    )

    streaming = left.isStreaming or right.isStreaming
    if not streaming and how == "inner":
        # batch fast path: time-bucket pre-keying. A plain equi-join on
        # `on` compares every per-key (left × right) row pair against
        # the interval — quadratic in per-key density (a hot meter at
        # corpus scale). With bucket width W = lower + upper, a left
        # row's admissible window [lt − lower, lt + upper] spans at
        # most two W-buckets, so exploding left into those ≤2 bucket
        # ids and equi-joining on (keys…, bucket) confines comparisons
        # to time-adjacent rows — the bucket-expansion range join
        # (operators/range_join.py) fused with the equi key. Outer
        # modes fall through to the plain join (the explode would
        # duplicate unmatched left rows).
        from pyspark.sql.types import TimestampType

        from open_energy_data_server_spark.streaming.stateful import _interval_ms

        ts_ok = isinstance(l_wm.schema[left_ts].dataType, TimestampType) and isinstance(
            r_wm.schema[right_ts].dataType, TimestampType
        )
        try:
            # single-unit intervals only; compound forms ('1 hour 30
            # minutes') fall through to the plain join, which accepts
            # the full Spark INTERVAL grammar
            w_us = (_interval_ms(lower) + _interval_ms(upper)) * 1000
        except (KeyError, ValueError):
            w_us = 0
        if w_us > 0 and ts_ok:
            lo_b = F.floor(
                (F.unix_micros(F.col(left_ts)) - F.lit(_interval_ms(lower) * 1000))
                / F.lit(w_us)
            )
            hi_b = F.floor(
                (F.unix_micros(F.col(left_ts)) + F.lit(_interval_ms(upper) * 1000))
                / F.lit(w_us)
            )
            la = l_wm.withColumn(
                "__tb", F.explode(F.array_distinct(F.array(lo_b, hi_b)))
            ).alias("__l")
            ra = r_wm.withColumn(
                "__tb", F.floor(F.unix_micros(F.col(right_ts)) / F.lit(w_us))
            ).alias("__r")
            joined = la.join(
                ra,
                F.expr(f"({key_cond}) AND __l.__tb = __r.__tb AND ({time_cond})"),
                "inner",
            )
            return _project_out(joined, left, right, on)

    la, ra = l_wm.alias("__l"), r_wm.alias("__r")
    joined = la.join(ra, F.expr(f"({key_cond}) AND ({time_cond})"), how)

    return _project_out(joined, left, right, on)


def _project_out(joined: DataFrame, left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    taken = set(left.columns)
    # keys survive unmatched-right rows in outer modes via coalesce
    out = [
        F.coalesce(F.col(f"__l.{c}"), F.col(f"__r.{c}")).alias(c)
        if c in on
        else F.col(f"__l.{c}")
        for c in left.columns
    ]
    for c in right.columns:
        if c in on:
            continue
        name = c
        while name in taken:
            name = f"{name}_right"
        taken.add(name)
        out.append(F.col(f"__r.{c}").alias(name))
    return joined.select(*out)
