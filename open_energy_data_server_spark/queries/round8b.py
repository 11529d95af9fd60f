"""Round-8 statistics/monitoring widening: robust trend, ACF, entropy,
robust outliers, seasonal profile, volatility bands, embedding
quantization, KS drift, and the ``$__unixEpochFilter`` Grafana macro.

These extend the monitoring/statistics surface a hosted open-data
warehouse exposes over its hypertables (the reference's Grafana
dashboards chart exactly these shapes over crawled series — e.g.
/root/reference/data/provisioning/grafana/dashboards/entsog.json
panels plot rates and rollups; the drift/outlier/trend statistics are
the quality checks a maintainer runs over the same tables).

Oracle-parity discipline (see queries/_util.py): every cross-row
float reduction is either an exact fixed-point BIGINT sum or exact
integer-count arithmetic; closed forms are spelled with identical
parenthesization on both engines, and per-row transcendentals are
rounded before summation so a last-ulp libm divergence cannot move
the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import (
    dsum,
    fmt_dbl,
    sql_dsum,
    sql_fmt_dbl,
)

# ---------------------------------------------------------------------------
# q_theil_sen_trend


@query(
    "q_theil_sen_trend",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             {sql_dsum("value")} AS v
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             (b.v - a.v) / (b.day - a.day) AS slope
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.day > a.day
    )
    SELECT event_type,
           COUNT(*) AS n_pairs,
           {sql_fmt_dbl("quantile_cont(slope, 0.5)")} AS theil_sen_slope
    FROM pairs GROUP BY 1
    """,
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per series: median of all pairwise
    daily-total slopes. The estimator is quadratic in PAIRS but the
    pairing happens AFTER the series is reduced to one exact
    fixed-point total per day — at 100 TB the pair count is bounded by
    |days|² per series (≈65k pairs for a 1-year hypertable chunk),
    not by row count, and the tiny daily relation broadcasts. Daily
    sums are exact BIGINT fixed point so both engines derive
    bit-identical slopes; the median interpolates two identical
    doubles identically."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(dsum("value").alias("v"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.v") - F.col("a.v"))
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        fmt_dbl(F.expr("percentile(slope, 0.5)")).alias("theil_sen_slope"),
    )


# ---------------------------------------------------------------------------
# q_autocorr_lag

_ACF_LAGS = (1, 24)


def _sql_acf_leg(lag: int) -> str:
    return f"""
      SELECT event_type, {lag} AS lag,
             COUNT(*) AS n,
             SUM(cnt) AS sx, SUM(prev) AS sy, SUM(cnt * prev) AS sxy,
             SUM(cnt * cnt) AS sxx, SUM(prev * prev) AS syy
      FROM (
        SELECT event_type, cnt,
               LAG(cnt, {lag}) OVER (PARTITION BY event_type ORDER BY hr) AS prev
        FROM hourly
      ) WHERE prev IS NOT NULL
      GROUP BY 1
    """


@query(
    "q_autocorr_lag",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ), scaffold AS (
      SELECT e.event_type, gs.hr
      FROM (SELECT DISTINCT event_type FROM events) e
      CROSS JOIN (
        SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr FROM bounds
      ) gs
    ), hourly AS (
      SELECT s.event_type, s.hr,
             COALESCE(c.cnt, 0) AS cnt
      FROM scaffold s LEFT JOIN (
        SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
      ) c ON s.event_type = c.event_type AND s.hr = c.hr
    ), moments AS (
      {_sql_acf_leg(_ACF_LAGS[0])}
      UNION ALL
      {_sql_acf_leg(_ACF_LAGS[1])}
    )
    SELECT event_type, lag, n,
           {sql_fmt_dbl(
               "CAST(n * sxy - sx * sy AS DOUBLE)"
               " / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
               "    * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))"
           )} AS acf
    FROM moments
    """,
)
def q_autocorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lag 1 and
    lag 24 (daily seasonality) per series. The series is densified on
    a generated hour scaffold (missing hours are real zeros — skipping
    them would misalign every lag), then Pearson r at each lag comes
    from EXACT integer moment sums (counts are ints; Σxy never leaves
    BIGINT), so shuffle order cannot move a bit. Scaffold size is
    |series|·|hours| — bounded metadata, not data. Both lags come
    from ONE window pass over ONE hourly build (stack → single agg:
    3 shuffles/3 scans, vs 6/6 for a leg-per-lag union); the window
    partitions per series over the bounded hourly rollup, never over
    raw events."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    scaffold = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(bounds).select(
                F.explode(
                    F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
                ).alias("hr")
            )
        )
    )
    counts = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    hourly = scaffold.join(counts, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("hr")
    # both lags from ONE window pass over ONE hourly build (a per-lag
    # leg would rebuild the scaffold+counts lineage per lag), then
    # stack to (lag, prev) rows and reduce in a single agg
    lagged = hourly.select(
        "event_type",
        "cnt",
        F.lag("cnt", _ACF_LAGS[0]).over(w).alias("prev_a"),
        F.lag("cnt", _ACF_LAGS[1]).over(w).alias("prev_b"),
    )
    stacked = lagged.select(
        "event_type",
        "cnt",
        F.expr(
            f"stack(2, {_ACF_LAGS[0]}, prev_a, {_ACF_LAGS[1]}, prev_b) "
            "AS (lag, prev)"
        ),
    ).where(F.col("prev").isNotNull())
    m = stacked.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sx"),
        F.sum("prev").alias("sy"),
        F.sum(F.col("cnt") * F.col("prev")).alias("sxy"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("sxx"),
        F.sum(F.col("prev") * F.col("prev")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    acf = (n * sxy - sx * sy).cast("double") / (
        F.sqrt((n * sxx - sx * sx).cast("double"))
        * F.sqrt((n * syy - sy * sy).cast("double"))
    )
    return m.select("event_type", "lag", "n", fmt_dbl(acf).alias("acf"))


# ---------------------------------------------------------------------------
# q_entropy_daily


@query(
    "q_entropy_daily",
    oracle=f"""
    WITH c AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS cnt
      FROM events GROUP BY 1, 2
    ), p AS (
      SELECT day, cnt,
             SUM(cnt) OVER (PARTITION BY day) AS total
      FROM c
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(SUM(CAST(ROUND(
                 -(CAST(cnt AS DOUBLE) / total)
                   * log2(CAST(cnt AS DOUBLE) / total) * {SCALE}, 0)
               AS BIGINT)) AS DOUBLE) / {SCALE}.0 AS entropy_bits,
           CAST(MAX(total) AS BIGINT) AS n_events
    FROM p GROUP BY 1
    """,
)
def q_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of the daily event-type mix — the
    category-balance monitor a curation pipeline runs per ingest day
    (collapsing entropy = a source went quiet). Counts reduce exactly;
    each -p·log2(p) term is rounded to 6 digits BEFORE the fixed-point
    sum, so a last-ulp log2 divergence between JVM and DuckDB libm
    cannot flip the hash. One shuffle on (day, type), then a
    |types|-wide window over the rollup."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    p = c.withColumn("total", F.sum("cnt").over(Window.partitionBy("day")))
    ratio = F.col("cnt").cast("double") / F.col("total")
    term = -ratio * F.log2(ratio)
    return p.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day")).agg(
        (
            F.sum(F.round(term * SCALE, 0).cast("bigint")).cast("double")
            / F.lit(float(SCALE))
        ).alias("entropy_bits"),
        F.max("total").cast("bigint").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# q_mad_outliers

_MAD_Z = 3.5
_MAD_C = 0.6745  # Φ⁻¹(0.75): scales MAD to σ-equivalents


@query(
    "q_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ), dev AS (
      SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN {_MAD_C} * ABS(d.value - d.med) / m.mad > {_MAD_Z}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           {sql_fmt_dbl(f"MAX({_MAD_C} * ABS(d.value - d.med) / m.mad)")}
             AS max_robust_z,
           {sql_fmt_dbl("MAX(d.med)")} AS med,
           {sql_fmt_dbl("MAX(m.mad)")} AS mad
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY 1
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per series: median/MAD in place of
    mean/σ (one 560-unit spike cannot drag its own threshold). Two
    exact interpolated medians (identical sorted inputs → identical
    interpolation on both engines), broadcast back as 1-row-per-group
    dims; max and count reductions are order-free. Plan: two
    percentile aggs over the series key + two broadcast joins — scan
    passes, no wide shuffle beyond the keyed aggs."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    d = dev.join(F.broadcast(mad), "event_type")
    z = F.lit(_MAD_C) * F.col("adev") / F.col("mad")
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(z > _MAD_Z, 1).otherwise(0)).alias("n_outliers"),
        fmt_dbl(F.max(z)).alias("max_robust_z"),
        fmt_dbl(F.max("med")).alias("med"),
        fmt_dbl(F.max("mad")).alias("mad"),
    )


# ---------------------------------------------------------------------------
# q_seasonal_profile


@query(
    "q_seasonal_profile",
    oracle=f"""
    WITH hod AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hod,
             {sql_dsum("value")} AS hsum, COUNT(*) AS hn
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type,
             CAST(SUM(CAST(ROUND(hsum * {SCALE}, 0) AS BIGINT)) AS DOUBLE)
               / {SCALE}.0 / SUM(hn) AS oavg
      FROM hod GROUP BY 1
    )
    SELECT h.event_type, CAST(h.hod AS INT) AS hod,
           {sql_fmt_dbl("(h.hsum / h.hn) / t.oavg")} AS seasonal_idx
    FROM hod h JOIN tot t ON h.event_type = t.event_type
    """,
)
def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index per series (hourly mean ÷ overall
    mean — the load-shape profile the reference's dashboards chart
    over demand hypertables). Single exact fixed-point rollup to
    |series|·24 rows; the overall mean is re-derived from the SAME
    hourly sums (re-scaling each exact descaled sum back to BIGINT
    keeps the grand total exact and order-free) so no second scan of
    the fact table is needed."""
    hod = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(dsum("value").alias("hsum"), F.count(F.lit(1)).alias("hn"))
    )
    tot = hod.groupBy("event_type").agg(
        (
            F.sum(F.round(F.col("hsum") * SCALE, 0).cast("bigint")).cast("double")
            / F.lit(float(SCALE))
            / F.sum("hn")
        ).alias("oavg")
    )
    return hod.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("hod").cast("int").alias("hod"),
        fmt_dbl((F.col("hsum") / F.col("hn")) / F.col("oavg")).alias(
            "seasonal_idx"
        ),
    )


# ---------------------------------------------------------------------------
# q_bollinger_breach

_BOLL_WIN = 7  # days, ROWS 6 PRECEDING
# ×100 keeps the 2-decimal measures exact while sv² stays far inside
# BIGINT: sv ≤ 5.6e4·rows/day, so Σ_window sv² ≲ 2e17 « 2⁶³ at bench
# scale (the ×1e6 SCALE would overflow the squared window sum).
_BOLL_SCALE = 100


@query(
    "q_bollinger_breach",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * {_BOLL_SCALE}, 0) AS BIGINT)) AS BIGINT)
               AS sv
      FROM events GROUP BY 1, 2
    ), band AS (
      SELECT event_type, day, sv,
             COUNT(*) OVER w AS wn,
             SUM(sv) OVER w AS wsum,
             SUM(sv * sv) OVER w AS wsumsq
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN {_BOLL_WIN - 1} PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           COUNT(*) AS n_days,
           CAST(SUM(CASE WHEN wn >= {_BOLL_WIN}
                     AND ABS(CAST(sv AS DOUBLE) - CAST(wsum AS DOUBLE) / wn)
                         > 2.0 * SQRT(CAST(wn * wsumsq - wsum * wsum AS DOUBLE))
                             / wn
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_breaches
    FROM band GROUP BY 1
    """,
)
def q_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volatility-band breach count per series: a day breaches when
    its total sits outside ±2σ of its trailing 7-day window (the
    monitoring rule a warehouse applies to crawled feeds — a breach is
    a feed anomaly or an ingest gap). All window moments stay in
    BIGINT over the exact scaled daily sums; mean/σ/compare happen in
    one deterministic double expression per row, and warm-up rows
    (wn < 7) never count. Windows run over the daily rollup —
    |days| rows per series — never over raw events."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * _BOLL_SCALE, 0).cast("bigint")).alias(
                "sv"
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_BOLL_WIN - 1), Window.currentRow)
    )
    band = daily.select(
        "event_type",
        "sv",
        F.count(F.lit(1)).over(w).alias("wn"),
        F.sum("sv").over(w).alias("wsum"),
        F.sum(F.col("sv") * F.col("sv")).over(w).alias("wsumsq"),
    )
    wn, wsum, wsumsq = F.col("wn"), F.col("wsum"), F.col("wsumsq")
    dev = F.abs(F.col("sv").cast("double") - wsum.cast("double") / wn)
    sd = F.sqrt((wn * wsumsq - wsum * wsum).cast("double")) / wn
    breach = (wn >= _BOLL_WIN) & (dev > 2.0 * sd)
    return band.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(breach, 1).otherwise(0)).alias("n_breaches"),
    )


# ---------------------------------------------------------------------------
# q_embedding_quantize


@query(
    "q_embedding_quantize",
    oracle=f"""
    WITH v AS (
      SELECT label,
             list_max(list_transform(embedding, x -> ABS(CAST(x AS DOUBLE))))
               AS amax,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ), q AS (
      SELECT label,
             list_max(list_transform(e,
               x -> ABS(x - ROUND(x * (127.0 / amax), 0) / (127.0 / amax))))
               AS vmax_err
      FROM v
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           {sql_dsum("vmax_err")} AS sum_qerr,
           {sql_fmt_dbl("MAX(vmax_err)")} AS max_qerr
    FROM q GROUP BY 1
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization error audit over the embedding
    store — the storage decision a 100 TB vector corpus actually
    faces (int8 is 4× smaller than float32; this measures what it
    costs). Per-vector: scale = 127/max|e|, reconstruct, take the max
    absolute element error — all via JVM higher-order array functions
    (transform/aggregate), zero Python, map-only until the |labels|-
    wide final agg. Per-vector doubles are bit-deterministic (fixed
    element order), so the fixed-point sum and max reduce exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    dvec = F.transform("embedding", lambda x: x.cast("double"))
    v = emb.select(
        "label",
        F.array_max(F.transform(dvec, F.abs)).alias("amax"),
        dvec.alias("e"),
    )
    scale = F.lit(127.0) / F.col("amax")
    err = F.array_max(
        F.transform(
            "e", lambda x: F.abs(x - F.round(x * scale, 0) / scale)
        )
    )
    q = v.select("label", err.alias("vmax_err"))
    return q.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        dsum("vmax_err").alias("sum_qerr"),
        fmt_dbl(F.max("vmax_err")).alias("max_qerr"),
    )


# ---------------------------------------------------------------------------
# q_ks_drift

_KS_SPLIT_DOM = 15  # calendar split: day-of-month 1-15 vs 16-end


@query(
    "q_ks_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value,
             CASE WHEN EXTRACT(day FROM ts) <= {_KS_SPLIT_DOM}
                  THEN 1 ELSE 0 END AS is_a
      FROM events
    ), binned AS (
      SELECT event_type, value,
             SUM(is_a) AS ca, SUM(1 - is_a) AS cb
      FROM tagged GROUP BY 1, 2
    ), stepped AS (
      SELECT event_type,
             SUM(ca) OVER (PARTITION BY event_type ORDER BY value) AS cuma,
             SUM(cb) OVER (PARTITION BY event_type ORDER BY value) AS cumb,
             SUM(ca) OVER (PARTITION BY event_type) AS na,
             SUM(cb) OVER (PARTITION BY event_type) AS nb
      FROM binned
    )
    SELECT event_type,
           CAST(MAX(na) AS BIGINT) AS n_first_half,
           CAST(MAX(nb) AS BIGINT) AS n_second_half,
           {sql_fmt_dbl(
               "CAST(MAX(ABS(cuma * nb - cumb * na)) AS DOUBLE)"
               " / (MAX(na) * MAX(nb))"
           )} AS ks_stat
    FROM stepped GROUP BY 1
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per series:
    first half of the month vs the rest (completing the drift kit
    beside q_cusum_drift and q_chisq_drift — KS catches shape changes
    χ² bins smear away). D = max|F̂ₐ−F̂ᵦ| evaluated as PURE INTEGER
    arithmetic: |cumA·nB − cumB·nA| maximized as BIGINT, one division
    at the end — no float ever enters the reduction. The ECDF window
    runs over the (type, value)-binned rollup: the testdata's measures
    are 2-decimal, so distinct bins are bounded by the value DOMAIN
    (≤56k here), not by row count — at 100 TB you'd pre-round the
    value to the same fixed grid and the plan shape is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        "value",
        F.when(F.dayofmonth("ts") <= _KS_SPLIT_DOM, 1).otherwise(0).alias("is_a"),
    )
    binned = tagged.groupBy("event_type", "value").agg(
        F.sum("is_a").alias("ca"), F.sum(1 - F.col("is_a")).alias("cb")
    )
    # nulls_last matches DuckDB's ASC default (a NULL-value bin
    # must not shift every cumulative count)
    wcum = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last()
    )
    wall = Window.partitionBy("event_type")
    stepped = binned.select(
        "event_type",
        F.sum("ca").over(wcum).alias("cuma"),
        F.sum("cb").over(wcum).alias("cumb"),
        F.sum("ca").over(wall).alias("na"),
        F.sum("cb").over(wall).alias("nb"),
    )
    d_int = F.abs(F.col("cuma") * F.col("nb") - F.col("cumb") * F.col("na"))
    return stepped.groupBy("event_type").agg(
        F.max("na").alias("n_first_half"),
        F.max("nb").alias("n_second_half"),
        fmt_dbl(
            F.max(d_int).cast("double") / (F.max("na") * F.max("nb"))
        ).alias("ks_stat"),
    )


# ---------------------------------------------------------------------------
# q_grafana_unixepoch

_UE_FROM = "2024-01-10 00:00:00"
_UE_TO = "2024-01-20 00:00:00"


@query(
    "q_grafana_unixepoch",
    oracle=f"""
    SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400 * 86400 AS time_sec,
           COUNT(*) AS n,
           {sql_dsum("value")} AS total
    FROM events
    WHERE CAST(FLOOR(epoch(ts)) AS BIGINT)
            BETWEEN CAST(epoch(TIMESTAMP '{_UE_FROM}') AS BIGINT)
                AND CAST(epoch(TIMESTAMP '{_UE_TO}') AS BIGINT)
    GROUP BY 1
    """,
)
def q_grafana_unixepoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference dashboards' epoch-series panel shape
    (``$__unixEpochFilter(ts)`` — 2 uses across the provisioning
    dashboards) driven verbatim through plans/grafana.expand_macros
    and hash-gated, completing the macro surface's oracle coverage
    (q_grafana_flow_rate covers ``$__interval_ms``; the 9-dashboard
    conformance walk covers analysis). The epoch filter expands to a
    sargable unix_timestamp BETWEEN over integer bounds; day-bucketing
    by integer division keeps the group key exact."""
    from open_energy_data_server_spark.plans.grafana import expand_macros
    from open_energy_data_server_spark.session import register_engine_functions

    register_engine_functions(spark)
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    raw_sql = f"""
        SELECT CAST(unix_timestamp(ts) DIV 86400 * 86400 AS BIGINT) AS time_sec,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS DOUBLE)
                 / {SCALE}.0 AS total
        FROM events
        WHERE $__unixEpochFilter(unix_timestamp(ts))
        GROUP BY 1
    """
    expanded = expand_macros(raw_sql, _UE_FROM, _UE_TO, "1 day")
    return spark.sql(expanded)
