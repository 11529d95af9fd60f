"""Round-8 batch 4: rank statistics, market-stack analytics, robust
means, attribution, and URL canonicalization.

Six genres still missing from the conformance surface after batch 3:

* Spearman rank correlation (the robust complement to
  q_cross_correlation's Pearson — monotone association on ranks with
  textbook average-rank tie handling);
* the merit-order curve (the power-market supply stack: order offers
  by marginal price, accumulate capacity, read the marginal price at
  a demand level — a weighted median by cumulative capacity, the
  single most energy-native query in the suite);
* trimmed + winsorized means (robust location estimates — what the
  reference's outlier-laden market feeds actually need charted);
* first-touch revenue attribution (credit each user's purchase
  revenue to the channel that acquired them);
* URL canonicalization (the LLM-curation dedup prerequisite: strip
  fragments/tracking params, lowercase the authority, drop default
  ports — RE2-safe chained rewrites, same discipline as q_pii_scrub);
* a binned conditional-mean curve with exact error bands (the wind
  power-curve shape: bin the driver variable, report n/mean/stddev of
  the response from integer moments).

Oracle parity follows the house fixed-point rules (_util docstring):
every float aggregate is a scaled-BIGINT sum, every ordering carries
a deterministic integer tiebreak, every regex avoids lookahead so the
Java and RE2 engines agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import fmt_dbl, sql_fmt_dbl

# ---------------------------------------------------------------------------
# q_spearman_daily — Spearman rank correlation between two daily series

_SP_A, _SP_B = "click", "purchase"


@query(
    "q_spearman_daily",
    oracle=f"""
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
      FROM events
    ), scaffold AS (
      SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
    ), daily AS (
      SELECT CAST(s.day AS DATE) AS day,
             COALESCE(a.sv, 0) AS a_sv, COALESCE(b.sv, 0) AS b_sv
      FROM scaffold s
      LEFT JOIN (SELECT CAST(ts AS DATE) AS day,
                        SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS sv
                 FROM events WHERE event_type = '{_SP_A}' GROUP BY 1) a
        ON CAST(s.day AS DATE) = a.day
      LEFT JOIN (SELECT CAST(ts AS DATE) AS day,
                        SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS sv
                 FROM events WHERE event_type = '{_SP_B}' GROUP BY 1) b
        ON CAST(s.day AS DATE) = b.day
    ), ranked AS (
      SELECT 2 * RANK() OVER (ORDER BY a_sv) - 1
               + COUNT(*) OVER (PARTITION BY a_sv) AS ra,
             2 * RANK() OVER (ORDER BY b_sv) - 1
               + COUNT(*) OVER (PARTITION BY b_sv) AS rb
      FROM daily
    ), m AS (
      SELECT COUNT(*) AS n, SUM(ra) AS sx, SUM(rb) AS sy,
             SUM(ra * rb) AS sxy, SUM(ra * ra) AS sxx, SUM(rb * rb) AS syy
      FROM ranked
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           {sql_fmt_dbl(
               "CAST(n * sxy - sx * sy AS DOUBLE)"
               " / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))"
               "    * SQRT(CAST(n * syy - sy * sy AS DOUBLE)))"
           )} AS spearman_rho
    FROM m
    """,
)
def q_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between the {_SP_A} and {_SP_B}
    daily exact totals — monotone association where Pearson
    (q_cross_correlation) assumes linearity. Ties get the textbook
    average rank, kept integral by doubling: 2·avg_rank =
    2·RANK() − 1 + |ties| (RANK() is the min-rank, so the average of
    the tied block's positions is rank + (ties−1)/2). Rho is then the
    closed-form Pearson on the doubled ranks (scale-invariant), from
    pure BIGINT moments — no floats until the final division. Cost
    shape: one scan, a |days|-row scaffold join, windows over the
    bounded daily rollup only (never over raw events)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("lo"), F.max(F.to_date("ts")).alias("hi")
    )
    scaffold = F.broadcast(bounds).select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )

    # ONE conditional-aggregate scan produces both series (the oracle
    # keeps its two-subquery formulation — independent plan shapes)
    sv = F.round(F.col("value") * SCALE, 0).cast("bigint")
    both = (
        ev.where(F.col("event_type").isin(_SP_A, _SP_B))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == _SP_A, sv)).alias("a_raw"),
            F.sum(F.when(F.col("event_type") == _SP_B, sv)).alias("b_raw"),
        )
    )
    daily = scaffold.join(both, "day", "left").select(
        F.coalesce("a_raw", F.lit(0)).alias("a_sv"),
        F.coalesce("b_raw", F.lit(0)).alias("b_sv"),
    )

    def rank2(col):
        return (
            2 * F.rank().over(Window.orderBy(col))
            - 1
            + F.count(F.lit(1)).over(Window.partitionBy(col))
        )

    ranked = daily.select(rank2("a_sv").alias("ra"), rank2("b_sv").alias("rb"))
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ra").alias("sx"),
        F.sum("rb").alias("sy"),
        F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
        F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    rho = (n * sxy - sx * sy).cast("double") / (
        F.sqrt((n * sxx - sx * sx).cast("double"))
        * F.sqrt((n * syy - sy * sy).cast("double"))
    )
    return m.select(
        n.cast("bigint").alias("n_days"), fmt_dbl(rho).alias("spearman_rho")
    )


# ---------------------------------------------------------------------------
# q_merit_order — marginal price at 50 % demand from the daily supply stack


@query(
    "q_merit_order",
    oracle=f"""
    WITH offers AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             l_extendedprice / l_quantity AS unit_price,
             CAST(l_quantity AS BIGINT) AS qty,
             l_orderkey, l_linenumber
      FROM lineitem
    ), stacked AS (
      SELECT day, unit_price, qty,
             SUM(qty) OVER (PARTITION BY day
                            ORDER BY unit_price, l_orderkey, l_linenumber
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_qty,
             SUM(qty) OVER (PARTITION BY day) AS tot_qty,
             COUNT(*) OVER (PARTITION BY day) AS n_offers
      FROM offers
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(MIN(n_offers) AS BIGINT) AS n_offers,
           CAST(MIN(tot_qty) AS BIGINT) AS total_capacity,
           {sql_fmt_dbl("MIN(unit_price)")} AS marginal_price,
           CAST(MIN(cum_qty) AS BIGINT) AS dispatched_capacity
    FROM stacked
    WHERE 2 * cum_qty >= tot_qty
    GROUP BY 1
    """,
)
def q_merit_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merit-order dispatch: per ship day, order the offers (lineitem
    rows; marginal cost = unit price, capacity = quantity) by price,
    accumulate capacity, and read the MARGINAL offer where the stack
    first covers 50 % of that day's total capacity — the day-ahead
    clearing-price query every power exchange runs, structurally a
    weighted median by cumulative weight. The marginal row is the
    price-minimal qualifying row, so after the threshold filter a
    plain MIN per day retrieves price/cum/n without a second window.
    Determinism: the stack order carries (orderkey, linenumber)
    tiebreaks, quantities are integral BIGINTs, and the 50 % test is
    the integer comparison 2·cum ≥ tot — no float thresholds. Cost:
    ONE exchange on day (window + agg share the partitioning)."""
    li = load_table(spark, sf_dir, "lineitem")
    offers = li.select(
        F.to_date("l_shipdate").alias("day"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        "l_orderkey",
        "l_linenumber",
    )
    w_stack = (
        Window.partitionBy("day")
        # nulls_last matches DuckDB's ASC default (a NULL-price
        # offer must not shift every real offer's cumulative)
        .orderBy(
            F.col("unit_price").asc_nulls_last(),
            "l_orderkey",
            "l_linenumber",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_day = Window.partitionBy("day")
    stacked = offers.select(
        "day",
        "unit_price",
        F.sum("qty").over(w_stack).alias("cum_qty"),
        F.sum("qty").over(w_day).alias("tot_qty"),
        F.count(F.lit(1)).over(w_day).alias("n_offers"),
    )
    # group by the raw day (same hash partitioning as the window —
    # one exchange total); format only after the agg
    return (
        stacked.where(2 * F.col("cum_qty") >= F.col("tot_qty"))
        .groupBy("day")
        .agg(
            F.min("n_offers").cast("bigint").alias("n_offers"),
            F.min("tot_qty").cast("bigint").alias("total_capacity"),
            fmt_dbl(F.min("unit_price")).alias("marginal_price"),
            F.min("cum_qty").cast("bigint").alias("dispatched_capacity"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_offers",
            "total_capacity",
            "marginal_price",
            "dispatched_capacity",
        )
    )


# ---------------------------------------------------------------------------
# q_trimmed_mean — 10 % trimmed + winsorized means per series

_TRIM_FRAC_PCT = 10  # two-sided, floor(n/10) rows clipped per tail


@query(
    "q_trimmed_mean",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type,
             CAST(ROUND(value * {SCALE}, 0) AS BIGINT) AS sv,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(MIN(n) AS BIGINT) AS n,
           CAST(MIN(n) // {_TRIM_FRAC_PCT} AS BIGINT) AS k_per_tail,
           {sql_fmt_dbl(
               f"CAST(SUM(CASE WHEN rn > n // {_TRIM_FRAC_PCT}"
               f" AND rn <= n - n // {_TRIM_FRAC_PCT}"
               " THEN sv ELSE 0 END) AS DOUBLE)"
               f" / {SCALE}.0"
               f" / (MIN(n) - 2 * (MIN(n) // {_TRIM_FRAC_PCT}))"
           )} AS trimmed_mean,
           {sql_fmt_dbl(
               f"CAST(SUM(CASE WHEN rn > n // {_TRIM_FRAC_PCT}"
               f" AND rn <= n - n // {_TRIM_FRAC_PCT}"
               " THEN sv ELSE 0 END)"
               f" + (MIN(n) // {_TRIM_FRAC_PCT})"
               f" * MAX(CASE WHEN rn = n // {_TRIM_FRAC_PCT} + 1"
               " THEN sv END)"
               f" + (MIN(n) // {_TRIM_FRAC_PCT})"
               f" * MAX(CASE WHEN rn = n - n // {_TRIM_FRAC_PCT}"
               " THEN sv END) AS DOUBLE)"
               f" / {SCALE}.0 / MIN(n)"
           )} AS winsorized_mean
    FROM ranked GROUP BY 1
    """,
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location per series: the {_TRIM_FRAC_PCT} % two-sided
    trimmed mean (drop the k = ⌊n/10⌋ smallest and largest samples)
    and the winsorized mean (clamp them to the surviving boundary
    values — algebraically: kept-sum + k·lo + k·hi over n, so the
    boundary rows are picked out of the SAME pass with rn = k+1 and
    rn = n−k markers, no self-join back). Row numbers carry the
    (value, event_id) tiebreak so ranks are unique and both engines
    trim the identical multiset; sums are scaled BIGINTs.

    The Spark plan deliberately AVOIDS the oracle's rank formulation:
    ``ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value)``
    sorts each series in ONE task, so with a handful of series
    parallelism collapses to |series| (measured 5.6× the DuckDB
    oracle at scale10). Instead the engine rolls the data up to
    (series, distinct scaled value, count) — a map-side-combined
    hash-agg on a HIGH-cardinality key, every core busy — and does
    the trim arithmetic on the bounded rollup with weighted tie
    counts: a value block whose cumulative range straddles a tail
    boundary contributes ``cnt − dropped_lo − dropped_hi`` copies
    (equal values are interchangeable, so partial drops are exact
    integer arithmetic, identical to the row-rank result by
    construction). The only per-series window runs over distinct
    values, not rows."""
    ev = load_table(spark, sf_dir, "events")
    roll = ev.groupBy(
        "event_type",
        F.round(F.col("value") * SCALE, 0).cast("bigint").alias("sv"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w_below = (
        Window.partitionBy("event_type")
        .orderBy(F.col("sv").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("event_type")
    cum = roll.select(
        "event_type",
        "sv",
        "cnt",
        F.coalesce(F.sum("cnt").over(w_below), F.lit(0)).alias("below"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    sv, cnt = F.col("sv"), F.col("cnt")
    below, n = F.col("below"), F.col("n")
    k = F.floor(n / _TRIM_FRAC_PCT)
    d_lo = F.greatest(F.lit(0), F.least(cnt, k - below))
    d_hi = F.greatest(F.lit(0), F.least(cnt, k - (n - below - cnt)))
    agg = cum.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_rows"),
        F.min(k).cast("bigint").alias("k_per_tail"),
        F.sum(sv * (cnt - d_lo - d_hi)).alias("kept_sum"),
        # the blocks holding ranks k+1 and n-k are the winsorizing
        # boundary values
        F.min(F.when(below + cnt > k, sv)).alias("lo_sv"),
        F.max(F.when(below < n - k, sv)).alias("hi_sv"),
    )
    n_rows = F.col("n_rows")
    k_out = F.col("k_per_tail")
    trimmed = (
        F.col("kept_sum").cast("double")
        / F.lit(float(SCALE))
        / (n_rows - 2 * k_out)
    )
    winsor = (
        (F.col("kept_sum") + k_out * F.col("lo_sv") + k_out * F.col("hi_sv"))
        .cast("double")
        / F.lit(float(SCALE))
        / n_rows
    )
    return agg.select(
        "event_type",
        n_rows.alias("n"),
        k_out.alias("k_per_tail"),
        fmt_dbl(trimmed).alias("trimmed_mean"),
        fmt_dbl(winsor).alias("winsorized_mean"),
    )


# ---------------------------------------------------------------------------
# q_first_touch_attribution — purchase revenue credited to acquisition channel


@query(
    "q_first_touch_attribution",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, event_type AS channel FROM (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
      ) WHERE rn = 1
    ), rev AS (
      SELECT user_id,
             SUM(CAST(ROUND(value * {SCALE}, 0) AS BIGINT)) AS sv,
             COUNT(*) AS n_purch
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT f.channel,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(r.user_id) AS BIGINT) AS n_converters,
           CAST(COALESCE(SUM(r.n_purch), 0) AS BIGINT) AS n_purchases,
           {sql_fmt_dbl(
               f"CAST(COALESCE(SUM(r.sv), 0) AS DOUBLE) / {SCALE}.0"
           )} AS attributed_revenue
    FROM firsts f LEFT JOIN rev r ON f.user_id = r.user_id
    GROUP BY 1
    """,
)
def q_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch revenue attribution: each user's total purchase
    value is credited to the event type of their very FIRST event
    (the acquisition channel) — the marketing-analytics staple that
    q_session_entry_paths (per-session entries) and q_retention_
    cohorts (calendar cohorts) bracket but don't answer. Two
    user-keyed reductions (first-touch row_number pick with a
    (ts, event_id) tiebreak; exact purchase sums) joined on user_id —
    both sides shuffle once on the SAME key, then one skinny rollup
    by channel. Converters = users with ≥1 purchase; revenue is the
    scaled-BIGINT exact sum."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.select("user_id", F.col("event_type").alias("channel"),
                  F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * SCALE, 0).cast("bigint")).alias("sv"),
            F.count(F.lit(1)).alias("n_purch"),
        )
    )
    joined = firsts.join(rev, "user_id", "left")
    return joined.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        # count the always-non-null aggregate column, not sv: a
        # converter whose purchase values are all NULL still counts
        # (matches the oracle's COUNT(r.user_id))
        F.count("n_purch").cast("bigint").alias("n_converters"),
        F.coalesce(F.sum("n_purch"), F.lit(0)).cast("bigint").alias("n_purchases"),
        fmt_dbl(
            F.coalesce(F.sum("sv"), F.lit(0)).cast("double") / F.lit(float(SCALE))
        ).alias("attributed_revenue"),
    )


# ---------------------------------------------------------------------------
# q_url_canonicalize — tracking-param/fragment-stripping URL normalizer

# Deterministic messy-URL synthesis: four variant shapes per doc_id.
# The OPERATOR under test is the canonicalizer chain below; the
# synthesis just manufactures the realistic mess (mixed-case hosts,
# default ports, utm_* params in different positions, fragments).
_URL_SPARK = (
    "CASE CAST((doc_id DIV 50) % 4 AS INT) "
    "WHEN 0 THEN concat('https://WWW.', upper(source), "
    "'.example.com:443/corpus/', source, '/doc?utm_source=feed&id=', "
    "CAST(doc_id % 50 AS STRING), '#top') "
    "WHEN 1 THEN concat('https://www.', source, "
    "'.Example.Com/corpus/', source, '/doc?id=', "
    "CAST(doc_id % 50 AS STRING), '&utm_campaign=x&utm_medium=email') "
    "WHEN 2 THEN concat('https://www.', source, "
    "'.example.com/corpus/', source, '/doc/?id=', "
    "CAST(doc_id % 50 AS STRING)) "
    "ELSE concat('https://www.', source, '.example.com:443/corpus/', "
    "source, '/doc?id=', CAST(doc_id % 50 AS STRING), '#section-2') END"
)
_URL_DUCK = (
    "CASE CAST((doc_id // 50) % 4 AS INT) "
    "WHEN 0 THEN concat('https://WWW.', upper(source), "
    "'.example.com:443/corpus/', source, '/doc?utm_source=feed&id=', "
    "CAST(doc_id % 50 AS VARCHAR), '#top') "
    "WHEN 1 THEN concat('https://www.', source, "
    "'.Example.Com/corpus/', source, '/doc?id=', "
    "CAST(doc_id % 50 AS VARCHAR), '&utm_campaign=x&utm_medium=email') "
    "WHEN 2 THEN concat('https://www.', source, "
    "'.example.com/corpus/', source, '/doc/?id=', "
    "CAST(doc_id % 50 AS VARCHAR)) "
    "ELSE concat('https://www.', source, '.example.com:443/corpus/', "
    "source, '/doc?id=', CAST(doc_id % 50 AS VARCHAR), '#section-2') END"
)

# The canonicalizer: an ordered chain of RE2-safe rewrites (no
# lookahead/backrefs — Java regex and RE2 agree on every pattern;
# replacement syntax differs, hence the ($1, \1) pair per step).
# Order matters and is part of the operator's contract:
#   1. drop the fragment;
#   2. drop utm_* params that have a successor, ANCHORED on their
#      leading ?/& so a param merely CONTAINING "utm_" (myutm_x=1)
#      survives; the separator is kept for the successor. One regex
#      pass removes alternate members of a consecutive utm run
#      (non-overlapping matches), so the step repeats — 3 passes
#      clear runs up to 8 tracking params;
#   3. drop a TRAILING utm_* param with its leading separator
#      (end-anchored — mid-string params were handled by step 2);
#   4. drop a now-dangling trailing '?';
#   5. lowercase scheme+authority (host casing is insignificant,
#      path casing is NOT — only the authority is folded);
#   6. strip the port only when it is the SCHEME'S default
#      (https:443 / http:80 — stripping http:443 would collapse two
#      distinct origins);
#   7. collapse a trailing '/' on a non-root path.
_UTM_MID = ("([?&])utm_[a-z]+=[^&#]*&", "$1", "\\1")
_CANON_STEPS = [
    ("#.*", "", ""),
    _UTM_MID,
    _UTM_MID,
    _UTM_MID,
    ("[?&]utm_[a-z]+=[^&#]*$", "", ""),
    ("\\?$", "", ""),
]
_PORT_STEPS = [
    ("^(https://[^/:]+):443$", "$1", "\\1"),
    ("^(http://[^/:]+):80$", "$1", "\\1"),
]


def _canon_spark(col):
    out = col
    for pat, java_rep, _ in _CANON_STEPS:
        out = F.regexp_replace(out, pat, java_rep)
    scheme_host = F.lower(F.regexp_extract(out, "^(https?://[^/]+)", 1))
    rest = F.regexp_replace(out, "^https?://[^/]+", "")
    for pat, java_rep, _ in _PORT_STEPS:
        scheme_host = F.regexp_replace(scheme_host, pat, java_rep)
    rest = F.regexp_replace(rest, "/+(\\?|$)", "$1")
    return F.concat(scheme_host, rest)


def _canon_sql(expr: str) -> str:
    out = expr
    for pat, _, re2_rep in _CANON_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{re2_rep}', 'g')"
    scheme_host = f"lower(regexp_extract({out}, '^(https?://[^/]+)', 1))"
    for pat, _, re2_rep in _PORT_STEPS:
        scheme_host = (
            f"regexp_replace({scheme_host}, '{pat}', '{re2_rep}')"
        )
    rest = f"regexp_replace({out}, '^https?://[^/]+', '')"
    rest = f"regexp_replace({rest}, '/+(\\?|$)', '\\1', 'g')"
    return f"concat({scheme_host}, {rest})"


@query(
    "q_url_canonicalize",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id, {_URL_DUCK} AS raw_url FROM documents
    ), canon AS (
      SELECT raw_url, {_canon_sql("raw_url")} AS canonical_url FROM urls
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT raw_url) AS BIGINT) AS n_raw_variants
    FROM canon
    GROUP BY 1
    """,
)
def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the prerequisite for URL-keyed corpus
    dedup (q_dedup_exact's key is the payload hash; crawl pipelines
    dedup by canonical URL first): strip fragments and utm_* tracking
    parameters, lowercase the scheme+authority (path case preserved),
    drop scheme-default ports, collapse trailing slashes. The rewrite
    chain is ordered, RE2-safe (no lookahead — Spark's Java regex and
    DuckDB's RE2 agree literally), and collapses the four synthetic
    variant shapes of each logical document URL into one key. Output:
    canonical URL with document count and surviving raw-variant
    count. Pure projection + one hash-agg — the canonical key is
    computed map-side, so at 100 TB this is the cheap first pass
    before any content hashing."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select(F.expr(_URL_SPARK).alias("raw_url"))
    canon = urls.select(
        "raw_url", _canon_spark(F.col("raw_url")).alias("canonical_url")
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("raw_url").cast("bigint").alias("n_raw_variants"),
    )


# ---------------------------------------------------------------------------
# q_volume_price_curve — binned conditional mean with exact error band


@query(
    "q_volume_price_curve",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(l_quantity AS BIGINT) AS qty_bin,
             CAST(ROUND(l_extendedprice / l_quantity * {SCALE}, 0) AS BIGINT)
               AS sp,
             CAST(ROUND((l_extendedprice / l_quantity)
                        * (l_extendedprice / l_quantity) * 100, 0) AS BIGINT)
               AS sp2
      FROM lineitem
    )
    SELECT qty_bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_fmt_dbl(
               f"CAST(SUM(sp) AS DOUBLE) / {SCALE}.0 / COUNT(*)"
           )} AS mean_unit_price,
           {sql_fmt_dbl(
               "SQRT(GREATEST(CAST(SUM(sp2) AS DOUBLE) / 100.0 / COUNT(*)"
               f" - (CAST(SUM(sp) AS DOUBLE) / {SCALE}.0 / COUNT(*))"
               f" * (CAST(SUM(sp) AS DOUBLE) / {SCALE}.0 / COUNT(*)), 0.0))"
           )} AS stddev_unit_price
    FROM pts GROUP BY 1
    """,
)
def q_volume_price_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned conditional-mean curve — the wind-power-curve operator
    shape (bin the driver variable, chart mean ± σ of the response
    per bin): per integral quantity bin, n, the exact mean unit price
    and its population stddev from integer moments (per-row rounded
    Σp and Σp², the q_seasonality_strength discipline — ×100 keeps
    p²·n inside 2⁶³ at any realistic scale since unit prices are
    O(10³)). ONE map-side-combined hash-agg: the curve never costs
    more than a scan plus a |bins|-row shuffle, which is what makes
    it chartable over 100 TB of SCADA samples."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice") / F.col("l_quantity")
    pts = li.select(
        F.col("l_quantity").cast("bigint").alias("qty_bin"),
        F.round(p * SCALE, 0).cast("bigint").alias("sp"),
        F.round(p * p * 100, 0).cast("bigint").alias("sp2"),
    )
    n = F.count(F.lit(1))
    mean = F.sum("sp").cast("double") / F.lit(float(SCALE)) / n
    # the independently-rounded moments (sp2 at 2 decimals, sp at 6)
    # can land a hair negative for a near-constant tiny bin — clamp,
    # since DuckDB's SQRT hard-errors on negatives
    var = F.greatest(
        F.sum("sp2").cast("double") / F.lit(100.0) / n - mean * mean,
        F.lit(0.0),
    )
    return pts.groupBy("qty_bin").agg(
        n.cast("bigint").alias("n"),
        fmt_dbl(mean).alias("mean_unit_price"),
        fmt_dbl(F.sqrt(var)).alias("stddev_unit_price"),
    )
