"""Scalar-transform conformance queries (SURVEY §2.3, P5–P14).

Each exercises one kit function from
``open_energy_data_server_spark.functions`` / ``sanitize`` against a
DuckDB oracle. All expressions are per-row deterministic doubles /
strings, so no fixed-point is needed except where sums appear.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.functions.numeric import (
    clip,
    kelvin_to_celsius,
    parse_locale_number,
    usd_barrel_to_eur_kwh,
)
from open_energy_data_server_spark.functions.timeutil import (
    combine_date_time,
    epoch_ms_to_ts,
    localize_to_utc,
    utc_to_zone,
)
from open_energy_data_server_spark.io import load_table, local_df
from open_energy_data_server_spark.operators import textops
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import sql_ts_str, ts_str
from open_energy_data_server_spark.sanitize import sanitize_columns


@query(
    "q_sanitize_columns",
    oracle=f"""
    SELECT o_orderkey AS bestell_nr_id,
           {sql_ts_str("o_orderdate")} AS datum_utc,
           o_totalprice AS preis_mwh,
           o_orderstatus AS oesterreich_status_a_b
    FROM orders WHERE o_totalprice > 100000
    """,
)
def q_sanitize_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: DB-safe snake_case column names, verified through the
    driver's schema comparison — the projection is aliased to the raw
    source headers and run through sanitize_columns."""
    orders = load_table(spark, sf_dir, "orders")
    ugly = orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderkey").alias("Bestell-Nr. (ID)"),
        ts_str("o_orderdate").alias("Datum  [UTC]"),
        F.col("o_totalprice").alias("Preis €/MWh"),
        F.col("o_orderstatus").alias("Österreich Status: A/B"),
    )
    return sanitize_columns(ugly)


@query(
    "q_locale_number_parse",
    oracle="""
    WITH raw(id, s) AS (VALUES
      (1, '1.234.567,89'), (2, ' 42,5 '), (3, 'N.A.'), (4, '-'),
      (5, '1.000'), (6, '0,5'), (7, '  -12,25'), (8, 'n.a.')
    )
    SELECT id,
           CAST(REPLACE(REPLACE(CASE WHEN TRIM(s) IN ('N.A.','n.a.','n/a','N/A','-','','NA')
                 THEN NULL ELSE TRIM(s) END, '.', ''), ',', '.') AS DOUBLE) AS parsed
    FROM raw
    """,
)
def q_locale_number_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/S2: decimal-comma + thousands-dot + NA-marker parsing — the
    post-CSV scalar step Spark's reader lacks (pandas ``decimal=','``,
    /root/reference/crawler/netztransparenz.py:88-98)."""
    raw = local_df(
        spark,
        [
            (1, "1.234.567,89"),
            (2, " 42,5 "),
            (3, "N.A."),
            (4, "-"),
            (5, "1.000"),
            (6, "0,5"),
            (7, "  -12,25"),
            (8, "n.a."),
        ],
        "id int, s string",
    )
    return raw.select("id", parse_locale_number("s").alias("parsed"))


@query(
    "q_case_when_classify",
    oracle="""
    SELECT CONCAT_WS('-',
             CASE WHEN o_totalprice < 50000 THEN 'small'
                  WHEN o_totalprice < 150000 THEN 'mid'
                  ELSE 'large' END,
             CASE o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'final'
                  ELSE 'partial' END) AS bucket,
           COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q_case_when_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11/P12: dict-mapping + case-when derivation + composite-ID
    build (/root/reference/crawler/iwugebaeudetypen.py:87-138) —
    chained when/otherwise, never a row-wise apply."""
    orders = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("large")
    )
    status_map = {"O": "open", "F": "final"}
    label = F.col("o_orderstatus")
    mapped = F.lit("partial")
    for k, v in reversed(status_map.items()):
        mapped = F.when(label == k, v).otherwise(mapped)
    return (
        orders.groupBy(F.concat_ws("-", tier, mapped).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_string_kit",
    oracle=r"""
    SELECT TRY_CAST(regexp_extract(p_brand, '(\d+)', 1) AS INTEGER) AS brand_num,
           split_part(p_type, ' ', 1) AS type_head,
           UPPER(split_part(p_name, ' ', 1)) AS name_head,
           COUNT(*) AS n
    FROM part GROUP BY 1, 2, 3
    """,
)
def q_string_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: regexp_extract / split / upper string kit
    (/root/reference/crawler/regelleistung.py:540-543)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(
            F.regexp_extract("p_brand", r"(\d+)", 1).cast("int").alias("brand_num"),
            F.split("p_type", " ").getItem(0).alias("type_head"),
            F.upper(F.split("p_name", " ").getItem(0)).alias("name_head"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_date_arithmetic",
    oracle=f"""
    SELECT o_orderkey,
           {sql_ts_str("o_orderdate + INTERVAL (o_orderkey % 24) HOUR")} AS due_ts,
           {sql_ts_str("date_trunc('month', o_orderdate)")} AS month_start,
           date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch_start
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: interval arithmetic from a derived offset — the reference's
    product-hour offsets (/root/reference/crawler/regelleistung.py:540-546)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        ts_str(
            F.col("o_orderdate")
            + F.expr("make_interval(0, 0, 0, 0, CAST(o_orderkey % 24 AS INT), 0, 0)")
        ).alias("due_ts"),
        ts_str(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


@query(
    "q_tz_roundtrip",
    oracle=f"""
    SELECT event_id,
           {sql_ts_str("timezone('UTC', timezone('Europe/Berlin', CAST(ts AS TIMESTAMP)))")}
             AS ts_if_berlin,
           {sql_ts_str("timezone('Europe/Berlin', timezone('UTC', CAST(ts AS TIMESTAMP)))")}
             AS ts_in_berlin
    FROM events WHERE event_id % 100 = 0
    """,
)
def q_tz_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: tz localize/convert — store UTC-naive, render zone-local
    (/root/reference/crawler/vea_industrial_load_profiles.py:93-101).
    DST correctness is unit-tested on transition days; the testdata is
    January (fixed +01:00)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_id") % 100 == 0).select(
        "event_id",
        ts_str(localize_to_utc("ts", "Europe/Berlin")).alias("ts_if_berlin"),
        ts_str(utc_to_zone("ts", "Europe/Berlin")).alias("ts_in_berlin"),
    )


@query(
    "q_timestamp_assembly",
    oracle=f"""
    SELECT event_id,
           {sql_ts_str("strptime(CONCAT(strftime(ts, '%Y-%m-%d'), ' ', strftime(ts, '%H:%M:%S')), '%Y-%m-%d %H:%M:%S')")}
             AS assembled,
           {sql_ts_str("make_timestamp(epoch_ms(CAST(ts AS TIMESTAMP)) * 1000)")} AS from_ms
    FROM events WHERE event_id % 100 = 1
    """,
)
def q_timestamp_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: date+time string assembly → timestamp, and epoch-ms parse
    (/root/reference/crawler/netztransparenz.py:98-107,
    /root/reference/crawler/smard.py:112)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.date_format("ts", "yyyy-MM-dd")
    t = F.date_format("ts", "HH:mm:ss")
    return ev.filter(F.col("event_id") % 100 == 1).select(
        "event_id",
        ts_str(combine_date_time(d, t)).alias("assembled"),
        ts_str(epoch_ms_to_ts(F.unix_millis("ts"))).alias("from_ms"),
    )


@query(
    "q_unit_conversions",
    oracle="""
    SELECT event_id,
           value - 273.15 AS celsius,
           SQRT(value * value + (value / 2) * (value / 2)) AS wind_speed,
           GREATEST(value - 400, 0.0) AS clipped_excess,
           value / 1.1 / 159.0 / 10.0 AS eur_per_kwh
    FROM events WHERE event_id % 50 = 0
    """,
)
def q_unit_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13/P14: the crawler unit-conversion chains (K→°C, √(u²+v²),
    clip-at-zero, ÷159÷10 OPEC chain). Squares are written ``x*x`` —
    ``pow`` is not correctly-rounded in either engine, multiply is."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.filter(F.col("event_id") % 50 == 0).select(
        "event_id",
        kelvin_to_celsius(v).alias("celsius"),
        F.sqrt(v * v + (v / 2) * (v / 2)).alias("wind_speed"),
        clip(v - 400, lower=0.0).alias("clipped_excess"),
        usd_barrel_to_eur_kwh(v, F.lit(1.1)).alias("eur_per_kwh"),
    )


@query(
    "q_interpolate_linear",
    oracle="""
    WITH sparse AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_id % 4 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    neigh AS (
      SELECT event_id, user_id, v,
             CAST(epoch_us(ts) AS DOUBLE) AS xd,
             last_value(v IGNORE NULLS) OVER wb AS prev_v,
             last_value(CASE WHEN v IS NOT NULL THEN CAST(epoch_us(ts) AS DOUBLE) END
               IGNORE NULLS) OVER wb AS prev_x,
             first_value(v IGNORE NULLS) OVER wf AS next_v,
             first_value(CASE WHEN v IS NOT NULL THEN CAST(epoch_us(ts) AS DOUBLE) END
               IGNORE NULLS) OVER wf AS next_x
      FROM sparse
      WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v) * (xd - prev_x) / (next_x - prev_x)
           END AS v_interp
    FROM neigh
    """,
)
def q_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15: linear series interpolation as pure window expressions
    (the windmodel power-curve fill,
    /root/reference/crawler/windmodel.py:83 — cubic variant is
    scipy-gated in operators.interpolate). x is exact epoch-micros so
    both engines interpolate on identical doubles."""
    from open_energy_data_server_spark.operators.interpolate import interpolate_linear

    ev = load_table(spark, sf_dir, "events")
    sparse = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.unix_micros("ts").alias("x_us"),
        F.when(F.col("event_id") % 4 == 0, None).otherwise(F.col("value")).alias("v"),
    )
    out = interpolate_linear(
        sparse, "v", "x_us", partition_by=["user_id"],
        out_col="v_interp", tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "v_interp")


# q_interpolate_cubic runs over a plan-embedded deterministic series set
# (not the sf tables) so its expected values can be precomputed ONCE into
# a committed fixture the DuckDB oracle replays — making the one formerly
# rows-only conformance row fully hash-checkable. Shared with
# tools/gen_cubic_fixture.py, which must be re-run if these change.
CUBIC_N_SERIES = 40
CUBIC_N_POINTS = 250
# repo-root-relative so the oracle string survives a different checkout
# location (resolved once at import; oracle_sql() is called afterwards)
CUBIC_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "cubic_expected.parquet",
)


def cubic_input_df(spark: SparkSession) -> DataFrame:
    """Deterministic sparse series: 40 series × 250 unevenly spaced
    knots (eighth-integer offsets, exact doubles), values from an
    integer multiplicative hash (exact at 3 decimals), ~35% nulled —
    including both edges, so end-piece extrapolation is exercised.

    Layout (round-11, guide §2.4): rows are enumerated series-major —
    ``id`` walks (series_id, point) contiguously and ``row_id`` is the
    same bijection onto 0..n-1 as before (row_id = point·40 + series),
    with the partition count a divisor of the series count so every
    series lands WHOLLY inside one range partition. The downstream
    spline fit can then run pre-partitioned (zero exchange, one Python
    task per partition) — the emitted (row_id, series_id, x, v) ROW
    SET is byte-identical to the old id-major enumeration."""
    n = CUBIC_N_SERIES * CUBIC_N_POINTS
    # largest divisor of CUBIC_N_SERIES ≤ the session parallelism:
    # range splits n evenly, so boundaries align to whole series
    par = max(spark.sparkContext.defaultParallelism, 1)
    k = max(d for d in range(1, CUBIC_N_SERIES + 1)
            if CUBIC_N_SERIES % d == 0 and d <= par)
    row_id = (F.col("id") % CUBIC_N_POINTS) * CUBIC_N_SERIES + F.expr(
        f"id DIV {CUBIC_N_POINTS}"
    )
    p = F.expr(f"row_id DIV {CUBIC_N_SERIES}")
    x = p + ((p * 7) % 5) / F.lit(8.0)
    v = ((F.col("row_id") * F.lit(2654435761)) % 1000003).cast("double") / F.lit(
        1000.0
    )
    is_gap = (p % 5 == 2) | (p % 7 == 3) | (p < 2) | (p > CUBIC_N_POINTS - 3)
    return (
        spark.range(0, n, 1, k)
        .select(row_id.alias("row_id"))
        .select(
            "row_id",
            (F.col("row_id") % CUBIC_N_SERIES).alias("series_id"),
            x.cast("double").alias("x"),
            F.when(is_gap, F.lit(None).cast("double")).otherwise(v).alias("v"),
        )
    )


@query(
    "q_interpolate_cubic",
    oracle=f"""
    SELECT row_id, series_id, v_cubic
    FROM read_parquet('{CUBIC_FIXTURE}')
    """,
)
def q_interpolate_cubic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15 cubic variant: not-a-knot cubic-spline fill per series
    (scipy-free numpy tridiagonal solve inside applyInPandas —
    operators.interpolate.notaknot_spline_eval), preserving the
    reference's interp1d(kind='cubic') semantics
    (/root/reference/crawler/windmodel.py:83). A global per-series
    solve is not SQL-expressible, so the oracle replays a committed
    fixture of expected values computed driver-side by the
    property-tested evaluator over the same deterministic input
    (tools/gen_cubic_fixture.py) — the hash check then verifies the
    distributed path (grouping, shuffle-order independence, Arrow
    round-trip) against the single-process evaluation bit-for-bit.
    Rounding happens through Spark's HALF_UP in both paths."""
    from open_energy_data_server_spark.operators.interpolate import interpolate_cubic

    sparse = cubic_input_df(spark)
    # use_scipy=False: the fixture pins the BUILT-IN evaluator's exact
    # floats; scipy's different solve order would perturb the last ulp
    # and flip 6-digit roundings in a scipy-equipped environment
    out = interpolate_cubic(
        sparse, "v", "x", partition_by=["series_id"], out_col="v_fit",
        use_scipy=False,
        # cubic_input_df enumerates series-major with range partitions
        # aligned to whole series — zero-exchange single mapInPandas
        pre_partitioned=True,
    )
    return out.select("row_id", "series_id", F.round("v_fit", 6).alias("v_cubic"))


@query(
    "q_null_handling",
    oracle="""
    WITH sparse AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v1,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value * 2 END AS v2
      FROM events
    )
    SELECT event_id,
           COALESCE(v1, 0.0) AS v1_filled,
           COALESCE(v2, v1, -1.0) AS v2_cascade
    FROM sparse
    WHERE NOT (v1 IS NULL AND v2 IS NULL)
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4: dropna(how='all', subset=...) + fillna / coalesce
    cascade (/root/reference/crawler/regelleistung.py:309-312)."""
    ev = load_table(spark, sf_dir, "events")
    v1 = F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("value"))
    v2 = F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value") * 2)
    sparse = ev.select("event_id", v1.alias("v1"), v2.alias("v2"))
    return sparse.na.drop(how="all", subset=["v1", "v2"]).select(
        "event_id",
        F.coalesce("v1", F.lit(0.0)).alias("v1_filled"),
        F.coalesce("v2", "v1", F.lit(-1.0)).alias("v2_cascade"),
    )


# station/operator name fixtures for accent folding (the reference's
# region-name joins hit exactly these umlaut/accent variants)
_ACCENT_NAMES = [(1, 'Düsseldorf'), (2, 'Köln'), (3, 'München'), (4, 'Straße des 17. Juni'), (5, 'Überlingen'), (6, 'Saarbrücken'), (7, 'Groß Ärmel'), (8, 'Électricité de France'), (9, 'Château-Thierry'), (10, 'Besançon'), (11, 'Genève'), (12, 'Plain Ascii GmbH')]

_ACCENT_VALUES = """(1, 'Düsseldorf'),
      (2, 'Köln'),
      (3, 'München'),
      (4, 'Straße des 17. Juni'),
      (5, 'Überlingen'),
      (6, 'Saarbrücken'),
      (7, 'Groß Ärmel'),
      (8, 'Électricité de France'),
      (9, 'Château-Thierry'),
      (10, 'Besançon'),
      (11, 'Genève'),
      (12, 'Plain Ascii GmbH')"""


@query(
    "q_accent_fold",
    oracle=f"""
    SELECT id, name, lower({textops.sql_fold_accents('name')}) AS folded
    FROM (VALUES
      {_ACCENT_VALUES}
    ) AS t(id, name)
    """,
)
def q_accent_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIN 5007-2 umlaut/accent folding for name-join normalization
    (ä→ae, ß→ss, é→e …) — the reference hand-patches such variants
    per crawler (/root/reference/crawler/nuts_mapper.py); here it is
    one reusable codegen replace chain (operators.textops.fold_accents)
    with a DuckDB twin nested in the same order. Uppercase variants
    fold before lower() so no accented char reaches a locale-dependent
    unicode lowercase."""
    from open_energy_data_server_spark.operators import textops as _t

    df = local_df(spark, _ACCENT_NAMES, "id int, name string")
    return df.select(
        "id", "name", F.lower(_t.fold_accents("name")).alias("folded")
    )
