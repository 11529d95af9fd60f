"""Timestamp kit (SURVEY P7, P8, P9, P16, A2).

Models: UTC-naive storage convention
(/root/reference/crawler/netztransparenz.py:98-107 — ``utc=True``
then ``tz_localize(None)``), epoch-ms parse
(/root/reference/crawler/smard.py:112), date+time+zone assembly,
Europe/Berlin quarter-hour calendars incl. DST transitions
(/root/reference/crawler/vea_industrial_load_profiles.py:82-107),
timescale ``time_bucket`` (dashboards), and calendar resampling
(/root/reference/crawler/instrat_pl.py:53-83).

Everything is built-in expressions; the DST-correct calendar is a
``sequence()`` of UTC instants (uniform there by construction) — the
reference builds the same grid with pandas ``date_range(tz=...)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
}


def bucket_width_seconds(width: int | str) -> int:
    """'15 minutes' / '1 hour' / 900 → seconds."""
    if isinstance(width, int):
        return width
    n_str, _, unit = width.strip().partition(" ")
    n = int(n_str)
    unit = unit.rstrip("s") or "second"
    return n * _UNIT_SECONDS[unit]


def time_bucket(width: int | str, ts: Column | str) -> Column:
    """TimescaleDB ``time_bucket`` — epoch-aligned fixed-width buckets.

    Column-API twin of the registered SQL function
    (session.register_engine_functions).
    """
    w = bucket_width_seconds(width)
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds((F.floor(F.unix_timestamp(c) / w) * w).cast("bigint"))


def epoch_ms_to_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("bigint"))


def localize_to_utc(col: Column | str, tz: str) -> Column:
    """Interpret a tz-naive wall-clock timestamp in ``tz`` → UTC naive."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_utc_timestamp(c, tz)


def utc_to_zone(col: Column | str, tz: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.from_utc_timestamp(c, tz)


def combine_date_time(date_col: Column | str, time_col: Column | str) -> Column:
    """'2024-03-31' + '02:30:00' strings → timestamp."""
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    t = F.col(time_col) if isinstance(time_col, str) else time_col
    return F.to_timestamp(F.concat_ws(" ", d, t), "yyyy-MM-dd HH:mm:ss")


def day_calendar(spark: SparkSession, start: str, end: str) -> DataFrame:
    """One row per day in [start, end] — the reindex/resample backbone.

    A ``sequence`` literal explodes executor-side; at 100 TB the
    calendar is still tiny (days × keys), so it is always the
    broadcast side of the join that follows.
    """
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )


def quarter_hour_calendar_utc(spark: SparkSession, year: int, tz: str = "Europe/Berlin") -> DataFrame:
    """The VEA 15-min grid for a civil year in ``tz``, as UTC instants.

    DST-correct by construction: the grid is uniform in UTC between
    the zone-localized year boundaries — 35,040 slots (35,136 leap),
    with the spring-forward local hour absent and the fall-back hour
    doubled, exactly like the reference's
    ``pd.date_range(tz='Europe/Berlin', freq='15min')``.
    Returns columns ``ts_utc``, ``ts_local`` (naive wall clock).
    """
    start = F.to_utc_timestamp(F.lit(f"{year}-01-01 00:00:00").cast("timestamp"), tz)
    end = F.to_utc_timestamp(F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"), tz)
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(start, end - F.expr("INTERVAL 15 MINUTES"), F.expr("INTERVAL 15 MINUTES"))
            ).alias("ts_utc")
        )
        .withColumn("ts_local", F.from_utc_timestamp("ts_utc", tz))
    )
