"""LLM-data-pipeline text conformance queries: text analysis, exact
dedup, n-gram Jaccard, MinHash+LSH, SimHash — on the ``documents``
table, each hash-verified against a DuckDB oracle that replays the
identical md5-based arithmetic.

The shared CTE fragments below mirror
``operators.textops`` / ``operators.dedup_text`` expression by
expression; keep them in sync when editing either side.

Known latent divergence (documented, not reachable in the driver's
corpora): Java's ``\\s`` matches vertical tab (\\x0B) but DuckDB's
``string_split_regex`` (RE2) does not, so a document containing \\x0B
would tokenize differently across engines. The generated corpora are
\\x0B-free; a production port should normalize exotic whitespace
(``regexp_replace(text, '[\\x0B\\f]', ' ')``) ahead of tokenization on
both sides. (The analogous '.'-vs-[^\\n] divergence on \\r was fixed
in q_char_diversity.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE
from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators import dedup_text, textkernel, textops
from open_energy_data_server_spark.queries import query

# ---- DuckDB twins of the textops primitives -------------------------------

SQL_TOKS = r"""
  toks AS (
    SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS t
    FROM documents
  )"""

SQL_SHINGLES = r"""
  sh AS (
    SELECT doc_id,
           unnest(list_distinct(
             CASE WHEN len(t) >= 3
                  THEN [t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] FOR i IN range(len(t) - 2)]
                  ELSE []::VARCHAR[] END)) AS s
    FROM toks
  )"""

SQL_HASH60 = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"

SQL_MINHASH = f"""
  hashed AS (
    SELECT doc_id, {SQL_HASH60.format(expr='s')} % 2147483647 AS h FROM sh
  ),
  params AS (
    SELECT CAST(i AS INTEGER) AS i, 1 + 2*i AS a, 7 + 13*i AS b
    FROM (SELECT unnest(range(16)) AS i)
  ),
  sig AS (
    SELECT doc_id AS doc, i, MIN((a * h + b) % 2147483647) AS mh
    FROM hashed, params GROUP BY 1, 2
  )"""

# Shared oracle chains for the round-4 dedup closure/span queries —
# hoisted (like SQL_TOKS/SQL_SHINGLES/SQL_MINHASH) so the queries that
# must AGREE on what a duplicate is (find vs purge, spans vs removal)
# cannot silently diverge. SQL_LSH_CLOSURE continues from SQL_MINHASH's
# `sig`; SQL_SPAN_CHAIN opens its own WITH (window=8, min_count=2 —
# matches the operators' conformance defaults).
SQL_LSH_CLOSURE = """    banded AS (
      SELECT doc, CAST(i // 2 AS INTEGER) AS band,
             array_to_string(list_sort(list(CAST(i AS VARCHAR) || ':' || CAST(mh AS VARCHAR))), ',')
               AS bsig
      FROM sig GROUP BY 1, 2
    ),
    cand AS (
      SELECT a.doc AS da, b.doc AS db
      FROM banded a JOIN banded b ON a.band = b.band AND a.bsig = b.bsig AND a.doc < b.doc
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT da AS a, db AS b FROM cand
      UNION
      SELECT db AS a, da AS b FROM cand
    ),
    reach AS (
      SELECT a AS node, a AS r FROM edges
      UNION
      SELECT re.node, e.b AS r FROM reach re JOIN edges e ON re.r = e.a
    )"""

SQL_SPAN_CHAIN = r"""    WITH toksd AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    win AS (
      SELECT doc_id AS doc, i AS start, i + 7 AS end_,
             CAST('0x' || substr(md5(array_to_string(t[i+1:i+8], ' ')), 1, 15)
               AS BIGINT) AS wh
      FROM toksd, LATERAL (SELECT unnest(range(len(t) - 7)) AS i)
      WHERE len(t) >= 8
    ),
    cnt AS (SELECT wh, COUNT(*) AS c FROM win GROUP BY 1),
    dup AS (SELECT doc, start, end_ FROM win JOIN cnt USING (wh) WHERE c >= 2),
    isl AS (
      SELECT doc, start, end_,
             CASE WHEN MAX(end_) OVER w IS NULL
                    OR start > MAX(end_) OVER w + 1
                  THEN 1 ELSE 0 END AS ni
      FROM dup
      WINDOW w AS (PARTITION BY doc ORDER BY start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl2 AS (
      SELECT doc, start, end_,
             SUM(ni) OVER (PARTITION BY doc ORDER BY start
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM isl
    )"""


def _sql_simhash_cte(bits: int = 60) -> str:
    sums = ",\n           ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}" for j in range(bits)
    )
    recon = " + ".join(f"(CASE WHEN b{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END)" for j in range(bits))
    return f"""
  th AS (
    SELECT doc_id, {SQL_HASH60.format(expr="tok")} AS h
    FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
  ),
  bitsums AS (
    SELECT doc_id, {sums}
    FROM th GROUP BY doc_id
  ),
  simhash AS (
    SELECT doc_id AS doc, {recon} AS simhash FROM bitsums
  )"""


@query(
    "q_text_stats",
    oracle=rf"""
    WITH {SQL_TOKS}
    SELECT doc_id,
           len(t) AS n_tokens,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
           length(text) AS n_chars,
           CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS BIGINT) AS token_len_sum,
           len(list_filter(t, x -> x IN ('the','a','an','of','and','or','is','in','to','for')))
             AS n_stop,
           len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
           LEAST(1.0, GREATEST(0.0,
             0.4 * LEAST((length(text) / len(t)) / 8.0, 1.0)
             + 0.4 * LEAST((len(list_filter(t, x -> x IN
                 ('the','a','an','of','and','or','is','in','to','for'))) / len(t)) * 5.0, 1.0)
             + 0.2 * (1.0 - LEAST((len(regexp_extract_all(text, '[.,;:!?]')) / length(text))
                 * 10.0, 1.0)))) AS quality
    FROM toks JOIN documents USING (doc_id)
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring (north-star text analysis):
    whitespace tokens, BPE-ish regex words, exact integer length sums,
    stopword/punctuation ratios, deterministic quality heuristic.
    Routed ADAPTIVELY (guide §4.2, round-11): the Arrow kernel and the
    relational expression form are pinned bit-identical
    (tests/test_textkernel.py), and which one is faster depends only
    on per-task document volume — the kernel pays a fixed mapInPandas
    IPC floor per task and wins past ~10-20k docs/task (a production
    128 MB split carries 10⁵-10⁶), while the driver's bench layouts
    (5k docs at sf0.1, 2.5k/task at scale10) sit below the crossover
    where the CodegenFallback token folds are still cheaper. The route
    picks per plan from parquet-footer row counts replayed through
    Spark's own split math (textkernel.kernel_pays_off)."""
    docs = load_table(spark, sf_dir, "documents")
    if textkernel.kernel_pays_off(spark, f"{sf_dir}/documents.parquet"):
        return textkernel.text_stats(docs, "doc_id", "text")
    return text_stats_relational(docs)


def text_stats_relational(docs: DataFrame) -> DataFrame:
    """The retained relational form of q_text_stats — the exactness
    pin target for the Arrow kernel (tests/test_textkernel.py).
    Round-11: the two interpreted HOF folds (token_length_sum
    aggregate, stopword ArrayFilter) are replaced by their codegen
    regex twins on the raw text (textops.*_text; equality pinned by
    test_codegen_text_twins) so the whole projection is
    whole-stage-codegen — measured 0.283 → 0.231 s solo at sf0.1."""
    t = textops.tokens("text")
    n_tokens = F.size(t)
    n_stop = textops.stopword_count_text("text")
    n_punct = textops.punct_count("text")
    n_chars = F.length("text")
    return docs.select(
        "doc_id",
        n_tokens.cast("bigint").alias("n_tokens"),
        textops.word_count_regex("text").cast("bigint").alias("n_words"),
        n_chars.cast("bigint").alias("n_chars"),
        textops.token_length_sum_text("text").alias("token_len_sum"),
        n_stop.cast("bigint").alias("n_stop"),
        n_punct.cast("bigint").alias("n_punct"),
        textops.quality_score(n_tokens, n_chars, n_stop, n_punct).alias("quality"),
    )


def _sql_lang_scores() -> str:
    """Score columns, computed once per doc (CTE materialization)."""
    cols = []
    for lang, markers in textops.LANG_MARKERS.items():
        mset = ", ".join(f"'{m}'" for m in markers)
        cols.append(f"len(list_filter(t, x -> x IN ({mset}))) AS score_{lang}")
    return ",\n             ".join(cols)


def _sql_lang_pred() -> str:
    """argmax CASE chain over the score COLUMNS — same fold as
    predict_lang_from_scores (exponential expression blowup avoided
    on both engines by referencing materialized columns)."""
    expr_lang, expr_score = "'und'", "-1"
    for lang in textops.LANG_MARKERS:
        score = f"score_{lang}"
        expr_lang = f"CASE WHEN {score} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {score} > {expr_score} THEN {score} ELSE {expr_score} END"
    return expr_lang


@query(
    "q_lang_id",
    oracle=rf"""
    WITH {SQL_TOKS},
    scores AS (
      SELECT doc_id, lang,
             {_sql_lang_scores()}
      FROM toks
    )
    SELECT doc_id, lang AS labeled_lang,
           {_sql_lang_pred()} AS predicted_lang,
           score_en, score_de
    FROM scores
    """,
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via stopword-marker scoring with fixed tie order —
    the n-gram heuristic (the synthetic corpus shares one vocabulary,
    so predictions are uniform; the operator is what is under test).
    Routed ADAPTIVELY between the Arrow kernel and the relational
    form on estimated per-task document volume — see q_text_stats;
    both forms pinned bit-identical (tests/test_textkernel.py, same
    counts and argmax tie order)."""
    docs = load_table(spark, sf_dir, "documents")
    if textkernel.kernel_pays_off(spark, f"{sf_dir}/documents.parquet"):
        return textkernel.lang_id(docs, "doc_id", "lang", "text")
    return lang_id_relational(docs)


def lang_id_relational(docs: DataFrame) -> DataFrame:
    """The retained relational form of q_lang_id — the exactness pin
    target for the Arrow kernel (tests/test_textkernel.py).
    Round-11: the five per-language interpreted ArrayFilter folds are
    replaced by codegen regex counts on the raw text
    (textops.stopword_count_text; equality pinned by
    test_codegen_text_twins), dropping the explode/struct generator
    barriers the fold form needed — the scores are now plain
    projection columns (CollapseProject keeps non-cheap aliases
    referenced by the argmax CASE chain un-inlined, verified by
    test_lang_id_regex_not_duplicated) and the whole plan is one
    codegen projection. Measured 0.222 → 0.186 s solo at sf0.1."""
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            textops.stopword_count_text("text", markers).alias(f"score_{lang}")
            for lang, markers in textops.LANG_MARKERS.items()
        ],
    )
    pred = textops.predict_lang_from_scores(
        {lang: F.col(f"score_{lang}") for lang in textops.LANG_MARKERS}
    )
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        F.col("score_en").cast("bigint").alias("score_en"),
        F.col("score_de").cast("bigint").alias("score_de"),
    )


@query(
    "q_dedup_exact",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id AS doc,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    )
    SELECT doc, fp,
           COUNT(*) OVER (PARTITION BY fp) AS dup_count,
           MIN(doc) OVER (PARTITION BY fp) AS keeper
    FROM fp
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via normalized md5 fingerprint (hash-groupBy): the
    shuffle carries 16-byte fingerprints, never document text."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_text.exact_dup_groups(docs, "doc_id", "text")


@query(
    "q_dedup_ngram_jaccard",
    oracle=rf"""
    WITH {SQL_TOKS}, {SQL_SHINGLES},
    shh AS (SELECT doc_id, {SQL_HASH60.format(expr='s')} AS h FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      FROM shh a JOIN shh b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, p.inter, sa.sz AS size_a, sb.sz AS size_b,
           p.inter / (sa.sz + sb.sz - p.inter) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.doc_a = sa.doc_id
    JOIN sizes sb ON p.doc_b = sb.doc_id
    WHERE p.inter / (sa.sz + sb.sz - p.inter) >= 0.8
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard near-dup pairs via the inverted shingle
    index (no cross join — candidates only where shingles collide).
    Finds the generator's planted near-duplicates (jaccard ≈ 0.99)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_text.jaccard_pairs(docs, "doc_id", "text", threshold=0.8)


@query(
    "q_minhash_signatures",
    oracle=f"""
    WITH {SQL_TOKS}, {SQL_SHINGLES}, {SQL_MINHASH}
    SELECT doc, i, mh FROM sig
    """,
)
def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=16, Broder affine scheme over a shared
    md5-derived 60-bit base hash): (doc, i, mh) long form — k·|docs|
    rows shuffle regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_text.minhash_signatures(docs, "doc_id", "text")


@query(
    "q_dedup_minhash_lsh",
    oracle=f"""
    WITH {SQL_TOKS}, {SQL_SHINGLES}, {SQL_MINHASH},
    banded AS (
      SELECT doc, CAST(i // 2 AS INTEGER) AS band,
             array_to_string(list_sort(list(CAST(i AS VARCHAR) || ':' || CAST(mh AS VARCHAR))), ',')
               AS bsig
      FROM sig GROUP BY 1, 2
    )
    SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_shared_bands
    FROM banded a JOIN banded b ON a.band = b.band AND a.bsig = b.bsig AND a.doc < b.doc
    GROUP BY 1, 2
    """,
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs: 8 bands × 2 rows; documents join
    on (band, band-signature) — |docs|·8 rows shuffled, never pairs²."""
    docs = load_table(spark, sf_dir, "documents")
    wide = dedup_text.minhash_wide(docs, "doc_id", "text")
    return dedup_text.lsh_candidate_pairs_wide(wide, k=16, rows_per_band=2)


@query(
    "q_simhash",
    oracle=f"""
    WITH {SQL_TOKS}, {_sql_simhash_cte()}
    SELECT doc, simhash FROM simhash
    """,
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document — one exploded pass + one hash agg
    with 60 conditional sums (all codegen; no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_text.simhash(docs, "doc_id", "text")


@query(
    "q_simhash_pairs",
    oracle=f"""
    WITH {SQL_TOKS}, {_sql_simhash_cte()}
    SELECT a.doc AS doc_a, b.doc AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM simhash a JOIN simhash b ON a.doc < b.doc
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: the EXACT hamming ≤ 3 self-join, but
    via pigeonhole banding (4 × 15-bit bands; Manku et al. WWW'07) —
    the oracle replays the O(n²) definition, the Spark plan shuffles
    only n·4 banded rows. The corpus' planted near-duplicates land at
    hamming ≤ 3; distance ≥ 5 is the binomial noise floor."""
    docs = load_table(spark, sf_dir, "documents")
    sims = dedup_text.simhash(docs, "doc_id", "text")
    return dedup_text.simhash_pairs_banded(sims, max_hamming=3).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


@query(
    "q_doc_fingerprint_winnow",
    oracle=rf"""
    WITH {SQL_TOKS},
    grams AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN [t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] FOR i IN range(len(t) - 2)]
                  ELSE []::VARCHAR[] END AS g
      FROM toks
    ),
    hs AS (
      SELECT doc_id,
             list_transform(g, s -> {SQL_HASH60.format(expr='s')}) AS h,
             len(g) AS n
      FROM grams
    )
    SELECT doc_id AS doc,
           CASE WHEN n = 0 THEN ''
                ELSE array_to_string(list_sort(list_distinct(
                  [CAST(list_aggregate(h[j+1 : j+least(4, n)], 'min') AS BIGINT)
                   FOR j IN range(greatest(n - 3, 1))])), ',')
           END AS fp,
           CASE WHEN n = 0 THEN 0
                ELSE len(list_distinct(
                  [list_aggregate(h[j+1 : j+least(4, n)], 'min')
                   FOR j IN range(greatest(n - 3, 1))]))
           END AS n_fp
    FROM hs
    """,
)
def q_doc_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via rolling-hash winnowing (north-star
    text analysis; Schleimer et al. SIGMOD'03): ordered word-3-gram
    hash sequence → 4-hash sliding windows → per-window minimum →
    sorted distinct fingerprint set. Per-row array folds only."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_text.winnow_fingerprint_strings(docs, "doc_id", "text", k=3, w=4)


@query(
    "q_stratified_sample",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
          < CASE lang
              WHEN 'en' THEN CAST(0.25 * 1152921504606846976 AS BIGINT)
              WHEN 'de' THEN CAST(0.50 * 1152921504606846976 AS BIGINT)
              WHEN 'fr' THEN CAST(0.10 * 1152921504606846976 AS BIGINT)
              ELSE -1 END
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (training-data curation):
    per-language Bernoulli rates via the md5 hash threshold — a pure
    scan projection, rerun-stable on any engine (df.sample is not),
    with nested thresholds so rate changes grow/shrink monotonically."""
    from open_energy_data_server_spark.operators.sampling import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_hash_sample(
        docs, "doc_id", {"en": 0.25, "de": 0.50, "fr": 0.10}, "lang"
    )
    return out.select("doc_id", "lang")


@query(
    "q_token_pack",
    oracle="""
    WITH sized AS (
      SELECT doc_id, lang, len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS off
      FROM sized
    )
    SELECT doc_id, lang, n_tokens, CAST(off // 2048 AS BIGINT) AS bin
    FROM packed
    """,
)
def q_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing (sequence packing for training batches):
    per-language doc_id-ordered prefix sums of token counts, bin =
    floor(start_offset / 2048). One shuffle on the stratum key."""
    from open_energy_data_server_spark.operators.sampling import pack_by_budget

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id", "lang", F.size(textops.tokens("text")).cast("bigint").alias("n_tokens")
    )
    return pack_by_budget(
        sized, "n_tokens", budget=2048, stratum_col="lang", order_col="doc_id"
    )


@query(
    "q_quality_filters",
    oracle=rf"""
    WITH {SQL_TOKS},
    base AS (
      SELECT doc_id,
             len(t) AS n_tokens,
             len(list_distinct(t)) AS n_distinct_tokens,
             len(regexp_extract_all(text, '[0-9]')) AS n_digit_chars,
             len(regexp_extract_all(lower(text), 'https?://')) AS n_urls
      FROM toks JOIN documents USING (doc_id)
    ),
    bg AS (
      SELECT doc_id, t[i+1] || ' ' || t[i+2] AS g
      FROM toks, LATERAL (SELECT unnest(range(len(t) - 1)) AS i)
      WHERE len(t) >= 2
    ),
    bgc AS (
      SELECT doc_id, MAX(c) AS top_bigram_n
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2)
      GROUP BY doc_id
    )
    SELECT b.doc_id, n_tokens, n_distinct_tokens, n_digit_chars, n_urls,
           COALESCE(top_bigram_n, 0) AS top_bigram_n,
           CASE WHEN n_tokens >= 20
                 AND n_distinct_tokens * 2 > n_tokens
                 AND COALESCE(top_bigram_n, 0) * 5 < n_tokens
                 AND n_digit_chars * 4 < length(text)
            THEN 1 ELSE 0 END AS keep
    FROM base b
    LEFT JOIN bgc ON b.doc_id = bgc.doc_id
    JOIN documents d ON b.doc_id = d.doc_id
    """,
)
def q_quality_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/quality gate (training-data curation) —
    see operators.textops.quality_signals; this query exposes the
    signal columns + keep flag for the whole corpus."""
    docs = load_table(spark, sf_dir, "documents")
    out = textops.quality_signals(docs, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_distinct_tokens").cast("bigint").alias("n_distinct_tokens"),
        F.col("n_digit_chars").cast("bigint").alias("n_digit_chars"),
        F.col("n_urls").cast("bigint").alias("n_urls"),
        "top_bigram_n",
        "keep",
    )


@query(
    "q_curation_pipeline",
    oracle=r"""
    WITH toksx AS (
      SELECT doc_id, lang, text, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    ),
    sig0 AS (
      SELECT doc_id, lang, text, t,
             len(t) AS n_tokens,
             len(list_distinct(t)) AS n_distinct_tokens,
             len(regexp_extract_all(text, '[0-9]')) AS n_digit,
             length(text) AS n_chars
      FROM toksx
    ),
    bg AS (
      SELECT doc_id, t[i+1] || ' ' || t[i+2] AS g
      FROM toksx, LATERAL (SELECT unnest(range(len(t) - 1)) AS i)
      WHERE len(t) >= 2
    ),
    bgc AS (
      SELECT doc_id, MAX(c) AS top_bigram_n
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1
    ),
    kept AS (
      SELECT s.doc_id, s.lang, s.text, s.t, s.n_tokens
      FROM sig0 s LEFT JOIN bgc USING (doc_id)
      WHERE s.n_tokens >= 20 AND s.n_distinct_tokens * 2 > s.n_tokens
        AND COALESCE(top_bigram_n, 0) * 5 < s.n_tokens
        AND s.n_digit * 4 < s.n_chars
    ),
    exact_kept AS (
      SELECT * FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS keeper
        FROM (SELECT *, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
              FROM kept)
      ) WHERE doc_id = keeper
    ),
    sh2 AS (
      SELECT doc_id,
             unnest(list_distinct(
               CASE WHEN len(t) >= 3
                    THEN [t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] FOR i IN range(len(t) - 2)]
                    ELSE []::VARCHAR[] END)) AS s
      FROM exact_kept
    ),
    hashed2 AS (
      SELECT doc_id, CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647 AS h
      FROM sh2
    ),
    params2 AS (
      SELECT CAST(i AS INTEGER) AS i, 1 + 2*i AS a, 7 + 13*i AS b
      FROM (SELECT unnest(range(16)) AS i)
    ),
    sig2 AS (
      SELECT doc_id AS doc, i, MIN((a * h + b) % 2147483647) AS mh
      FROM hashed2, params2 GROUP BY 1, 2
    ),
    banded2 AS (
      SELECT doc, CAST(i // 2 AS INTEGER) AS band,
             array_to_string(list_sort(list(CAST(i AS VARCHAR) || ':' || CAST(mh AS VARCHAR))), ',') AS bsig
      FROM sig2 GROUP BY 1, 2
    ),
    drops AS (
      SELECT DISTINCT b.doc AS doc_id
      FROM banded2 a JOIN banded2 b ON a.band = b.band AND a.bsig = b.bsig AND a.doc < b.doc
    ),
    samp AS (
      SELECT doc_id, lang, n_tokens FROM exact_kept
      WHERE doc_id NOT IN (SELECT doc_id FROM drops)
        AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
            < CASE WHEN lang IN ('en', 'de', 'fr')
                   THEN CAST(0.8 * 1152921504606846976 AS BIGINT) ELSE -1 END
    ),
    packed AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS off
      FROM samp
    )
    SELECT doc_id, lang, n_tokens, CAST(off // 2048 AS BIGINT) AS bin FROM packed
    """,
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data curation, composed from the engine's
    operators in the canonical order a 100 TB corpus runs them:
    quality gate (Gopher signals) → exact dedup keep-first (normalized
    md5) → MinHash-LSH near-dup removal (greedy keep-lowest-id) →
    deterministic stratified sampling → token-budget packing. Every
    stage is the already-verified operator; the oracle replays the
    whole chain in one SQL statement."""
    from pyspark.sql import Window

    from open_energy_data_server_spark.operators.sampling import (
        pack_by_budget,
        stratified_hash_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    gated = textops.quality_signals(docs, "doc_id", "text").filter(F.col("keep") == 1)
    fp = gated.withColumn("fp", textops.fingerprint_normalized("text"))
    exact = fp.withColumn(
        "__keeper", F.min("doc_id").over(Window.partitionBy("fp"))
    ).filter(F.col("doc_id") == F.col("__keeper"))
    # stage materialization: three consumers (minhash side, anti-join
    # left, sample) would each re-derive the quality+dedup lineage —
    # Catalyst does not share common subtrees across branches. At
    # 100 TB this persist is the stage boundary a pipeline would write
    # to the lake; here it cuts the plan from 6 scans to 2.
    from pyspark import StorageLevel

    exact = exact.persist(StorageLevel.MEMORY_AND_DISK)
    wide = dedup_text.minhash_wide(exact.select("doc_id", "text"), "doc_id", "text")
    pairs = dedup_text.lsh_candidate_pairs_wide(wide, k=16, rows_per_band=2)
    drops = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    surv = exact.join(drops, "doc_id", "left_anti")
    sampled = stratified_hash_sample(
        surv, "doc_id", {"en": 0.8, "de": 0.8, "fr": 0.8}, "lang"
    )
    return pack_by_budget(
        sampled.select("doc_id", "lang", F.col("n_tokens").cast("bigint").alias("n_tokens")),
        "n_tokens",
        budget=2048,
        stratum_col="lang",
        order_col="doc_id",
    )


@query(
    "q_sample_fixed_k",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT),
                        doc_id) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def q_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-20-per-language deterministic sample (k smallest key
    hashes) — the rerun-stable reservoir analog; growing k only adds
    rows, so a refreshed eval set never churns."""
    from open_energy_data_server_spark.operators.sampling import fixed_size_hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return fixed_size_hash_sample(docs, "doc_id", k=20, stratum_col="lang").select(
        "doc_id", "lang"
    )


@query(
    "q_decontaminate",
    oracle=rf"""
    WITH ctoks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE doc_id % 20 <> 0
    ),
    btoks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents WHERE doc_id % 20 = 0
    ),
    csh AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN [t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] FOR i IN range(len(t) - 2)]
             ELSE []::VARCHAR[] END)) AS s
      FROM ctoks
    ),
    bsh AS (
      SELECT DISTINCT unnest(list_distinct(
        CASE WHEN len(t) >= 3
             THEN [t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] FOR i IN range(len(t) - 2)]
             ELSE []::VARCHAR[] END)) AS s
      FROM btoks
    ),
    chh AS (SELECT doc_id, {SQL_HASH60.format(expr='s')} AS h FROM csh),
    bh AS (SELECT DISTINCT {SQL_HASH60.format(expr='s')} AS h FROM bsh),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM chh GROUP BY 1),
    cont AS (
      SELECT c.doc_id, COUNT(*) AS nc FROM chh c JOIN bh USING (h) GROUP BY 1
    )
    SELECT c.doc_id AS doc, z.sz AS n_grams, c.nc AS n_contaminated,
           c.nc / z.sz AS frac
    FROM cont c JOIN sizes z USING (doc_id)
    WHERE c.nc / z.sz >= 0.2
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (training-data suite; no reference
    analog): flag training docs whose word-3-gram sets overlap an
    eval/benchmark corpus ≥ 20%. Here the deterministic 1/20 doc_id
    slice stands in for the benchmark; the corpus is the rest. The
    benchmark gram-hash set broadcasts (eval sets are small by
    definition), the corpus side is a scan-shaped projection, and the
    only shuffle is the final per-doc count — no text in any exchange.
    The planted near-duplicate pairs straddling the split surface as
    high-frac contamination hits."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    return dedup_text.contamination_flags(
        corpus, bench, "doc_id", "text", "doc_id", "text", n=3, min_frac=0.2
    )


@query(
    "q_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           md5({textops.sql_scrub_pii("raw")}) AS scrubbed_md5,
           (len({textops.sql_scrub_pii("raw")})
            - len(REPLACE({textops.sql_scrub_pii("raw")}, '[REDACTED]', '')))
             AS n_redacted_chars
    FROM (
      SELECT doc_id,
             text || ' contact u' || doc_id ||
             '@mail.example.com or +49 241 8094-' || (doc_id % 1000) ||
             ' node 10.0.' || (doc_id % 256) || '.7 end' AS raw
      FROM documents WHERE doc_id % 5 = 0
    )
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data hygiene; no reference analog):
    email, IPv4 and phone-number patterns redacted in one chained
    regexp projection (textops.scrub_pii — RE2/Java common subset so
    the oracle replays it exactly). The corpus text carries no PII, so
    deterministic synthetic contact lines are appended per doc and
    provably removed: the oracle compares the md5 of the scrubbed
    text plus the redacted-char delta."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    raw = F.concat(
        F.col("text"),
        F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +49 241 8094-"),
        (F.col("doc_id") % 1000).cast("string"),
        F.lit(" node 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 end"),
    )
    scrubbed = textops.scrub_pii(raw)
    return docs.select(
        "doc_id",
        F.md5(scrubbed).alias("scrubbed_md5"),
        (F.length(scrubbed) - F.length(F.replace(scrubbed, F.lit("[REDACTED]"), F.lit(""))))
        .cast("bigint")
        .alias("n_redacted_chars"),
    )


@query(
    "q_domain_stats",
    oracle="""
    SELECT regexp_extract(url, 'https?://([^/]+)/', 1) AS domain,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_words AS BIGINT)) AS BIGINT) AS total_words
    FROM (
      SELECT 'https://w' || (doc_id % 7) || '.ex' || (doc_id % 3) || '.org/p/' || doc_id AS url,
             len(string_split_regex(trim(text), '\\s+')) AS n_words
      FROM documents
    )
    GROUP BY 1
    """,
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus stats (the domain-level filter/mix step every
    web-scale curation pipeline runs; no reference analog). Domain is
    pulled from the source URL with the same regexp_extract both
    engines implement; synthetic deterministic URLs stand in since the
    corpus has none. One hash-agg exchange keyed on domain."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://w"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".ex"), (F.col("doc_id") % 3).cast("string"),
        F.lit(".org/p/"), F.col("doc_id").cast("string"),
    )
    return (
        docs.select(
            F.regexp_extract(url, r"https?://([^/]+)/", 1).alias("domain"),
            F.size(F.split(F.trim("text"), r"\s+")).cast("bigint").alias("n_words"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
        )
    )


@query(
    "q_boilerplate_strip",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
      FROM documents WHERE len(trim(text)) > 0
    ),
    l AS (
      SELECT doc_id, gs.i AS pos,
             array_to_string(words[(gs.i*8+1):(gs.i*8+8)], ' ') AS line
      FROM w, LATERAL (
        SELECT unnest(generate_series(0,
          CAST(floor((len(words) - 1) / 8) AS INT))) AS i) gs
    ),
    b AS (
      SELECT line FROM l GROUP BY line HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT doc_id,
           COUNT(*) AS n_lines,
           COUNT(CASE WHEN line IN (SELECT line FROM b) THEN 1 END) AS n_dropped,
           COALESCE(string_agg(CASE WHEN line NOT IN (SELECT line FROM b)
                                    THEN line END, ' ' ORDER BY pos),
                    '') AS cleaned_text
    FROM l GROUP BY doc_id
    """,
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate-line dedup (CCNet/RefinedWeb line-
    frequency strip; training-data suite, no reference analog): 8-word
    lines occurring in ≥2 distinct documents are dropped everywhere and
    each document is rebuilt in original line order
    (operators.textops.strip_boilerplate_lines — frequency pass
    shuffles only 16-byte hashes, boilerplate set broadcasts; since
    r10 text crosses zero exchanges, only flagged (doc, pos) ints
    shuffle and the rebuild is a map-side word-index filter). The
    oracle replays the definition with
    correlated IN-subqueries; hashing the rebuilt text pins both the
    drop decisions and the reassembly order."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.strip_boilerplate_lines(docs, "doc_id", "text")


@query(
    "q_duplicate_spans",
    oracle=f"""
{SQL_SPAN_CHAIN}
    SELECT doc AS doc_id,
           CAST(MIN(start) AS BIGINT) AS span_start,
           CAST(MAX(end_) AS BIGINT) AS span_end,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl2 GROUP BY doc, island
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. 2022) — maximal
    token spans whose 8-token windows repeat anywhere in the corpus
    (operators.dedup_text.duplicate_spans: rolling hash60 windows →
    corpus-wide count on the 8-byte key → gaps-and-islands merge).
    The relational replacement for suffix-array dedup at scale."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_text.duplicate_spans(docs, "doc_id", "text", window=8, min_count=2)


@query(
    "q_dedup_groups",
    oracle=f"""
    WITH RECURSIVE {SQL_TOKS}, {SQL_SHINGLES}, {SQL_MINHASH},
{SQL_LSH_CLOSURE}
    SELECT node AS doc_id, MIN(r) AS group_id, (node = MIN(r)) AS is_keeper
    FROM reach GROUP BY node
    """,
)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-group resolution: distributed connected components
    (min-label propagation to fixpoint, operators/graph.py) over the
    MinHash-LSH candidate pairs — every flagged doc's transitive
    duplicate group + the lowest-id keeper. The DuckDB oracle reaches
    the identical fixpoint via a recursive-CTE transitive closure, so
    the iterative distributed algorithm sits behind the full hash
    gate."""
    from open_energy_data_server_spark.operators import graph

    docs = load_table(spark, sf_dir, "documents")
    wide = dedup_text.minhash_wide(docs, "doc_id", "text")
    pairs = dedup_text.lsh_candidate_pairs_wide(wide, k=16, rows_per_band=2)
    return graph.dedup_groups(pairs, "doc_a", "doc_b")


@query(
    "q_mixture_sample",
    oracle=r"""
    WITH sized AS (
      SELECT doc_id, lang,
             CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
               AS h
      FROM documents
    ),
    budgets(lang, b) AS (VALUES ('de', 1500), ('en', 6000), ('zh', 2000)),
    offs AS (
      SELECT doc_id, lang, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
               AS start_offset
      FROM sized
    )
    SELECT doc_id, lang, n_tokens, start_offset
    FROM offs JOIN budgets USING (lang)
    WHERE start_offset < b
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture construction (data MIXING, the step after
    per-domain stats): fill per-language token budgets ({de: 1500,
    en: 6000, zh: 2000} — es/fr excluded) in hash order, so the
    mixture is rerun-stable and nested under budget growth
    (operators.sampling.mixture_sample)."""
    from open_energy_data_server_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "lang",
        F.size(textops.tokens("text")).cast("bigint").alias("n_tokens"),
    )
    return mixture_sample(
        sized, "doc_id", "lang", "n_tokens",
        budgets={"de": 1500, "en": 6000, "zh": 2000},
    )


@query(
    "q_dedup_purge",
    oracle=f"""
    WITH RECURSIVE {SQL_TOKS}, {SQL_SHINGLES}, {SQL_MINHASH},
{SQL_LSH_CLOSURE},
    dropped AS (
      SELECT node AS doc_id FROM reach GROUP BY node HAVING node <> MIN(r)
    )
    SELECT lang,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(len(string_split_regex(lower(trim(text)), '\\s+'))) AS BIGINT)
             AS n_tokens_kept
    FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    GROUP BY lang
    """,
)
def q_dedup_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION, end to end: MinHash-LSH candidate pairs →
    connected-component duplicate groups → purge every non-keeper →
    per-language corpus accounting of what survives. Composes three
    engine layers (dedup_text, graph, aggregation) under one hash
    gate; at scale the purge is the left-anti join every curation run
    ships — the drop set is |flagged non-keepers| rows, tiny next to
    the corpus, and the corpus scan never shuffles."""
    from open_energy_data_server_spark.operators import graph

    docs = load_table(spark, sf_dir, "documents")
    wide = dedup_text.minhash_wide(docs, "doc_id", "text")
    pairs = dedup_text.lsh_candidate_pairs_wide(wide, k=16, rows_per_band=2)
    groups = graph.dedup_groups(pairs, "doc_a", "doc_b")
    drop = groups.filter(~F.col("is_keeper")).select("doc_id")
    kept = docs.join(drop, "doc_id", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum(F.size(textops.tokens("text"))).cast("bigint").alias("n_tokens_kept"),
    )


@query(
    "q_remove_duplicate_spans",
    oracle=f"""
{SQL_SPAN_CHAIN},
    spans AS (
      SELECT doc, MIN(start) AS s, MAX(end_) AS e FROM isl2 GROUP BY doc, island
    ),
    tokpos AS (
      SELECT doc_id AS doc, i AS pos, t[i + 1] AS tok
      FROM toksd, LATERAL (SELECT unnest(range(len(t))) AS i)
    ),
    marked AS (
      SELECT tp.doc, tp.pos, tp.tok, (sp.doc IS NOT NULL) AS in_span
      FROM tokpos tp
      LEFT JOIN spans sp
        ON tp.doc = sp.doc AND tp.pos BETWEEN sp.s AND sp.e
    )
    SELECT doc AS doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN in_span THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN NOT in_span THEN tok END, ' '
                               ORDER BY pos), '') AS clean_text
    FROM marked GROUP BY doc
    """,
)
def q_remove_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup REALIZED (Lee et al.'s removal step):
    every duplicated span excised and the text rebuilt, per document
    (operators.dedup_text.remove_duplicate_spans). Text crosses zero
    exchanges (r10): the span sliver joins back to the scan and the
    rebuild is a map-side positional filter of the token array."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_text.remove_duplicate_spans(docs, "doc_id", "text", window=8)


@query(
    "q_bigram_lm_score",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(range(len(toks))) AS pos, unnest(toks) AS tok
      FROM t
    ),
    ft AS (SELECT doc_id, pos, tok FROM tok WHERE tok <> ''),
    bg AS (
      SELECT doc_id,
             LAG(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS prev, tok
      FROM ft
    ),
    bgf AS (SELECT doc_id, prev, tok FROM bg WHERE prev IS NOT NULL),
    bc AS (SELECT prev, tok, COUNT(*) AS c_pt FROM bgf GROUP BY 1, 2),
    pc AS (SELECT prev, CAST(SUM(c_pt) AS BIGINT) AS c_p FROM bc GROUP BY 1),
    scored AS (
      SELECT b.doc_id, CAST(bc.c_pt AS DOUBLE) / CAST(pc.c_p AS DOUBLE) AS p
      FROM bgf b
      JOIN bc ON b.prev = bc.prev AND b.tok = bc.tok
      JOIN pc ON b.prev = pc.prev
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           (CAST(SUM(CAST(SIGN(p * {SCALE}) * FLOOR(ABS(p * {SCALE}) + 0.5)
                          AS BIGINT)) AS DOUBLE) / {SCALE}.0)
             / CAST(COUNT(*) AS DOUBLE) AS lm_score
    FROM scored GROUP BY doc_id
    """,
)
def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM fluency score per document (CCNet-style
    quality bucketing signal; operators/textops.py bigram_lm_scores).
    Mean conditional probability instead of log-perplexity keeps the
    whole statistic inside the exact-arithmetic determinism contract
    (no transcendentals); ranking behavior for bucketing is the same."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.bigram_lm_scores(docs, "doc_id", "text")


@query(
    "q_shuffle_shards",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             {SQL_HASH60.format(expr="CAST(doc_id AS VARCHAR)")} AS hh
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(hh % 8 AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY hh % 8 ORDER BY hh, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-shuffle (operators/sampling.py
    shuffle_shards): every document lands in one of 8 shards by key
    hash with a stable pseudo-random in-shard position — the
    shuffle-before-sharding export step of a training pipeline,
    rerun-stable with no global sort (shards permute independently)."""
    from open_energy_data_server_spark.operators.sampling import shuffle_shards

    docs = load_table(spark, sf_dir, "documents")
    return shuffle_shards(docs, "doc_id", n_shards=8).select(
        "doc_id", "lang", "shard", "pos"
    )


@query(
    "q_train_val_test_split",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             {SQL_HASH60.format(expr="CAST(doc_id AS VARCHAR)")} AS hh
      FROM documents
    ),
    labeled AS (
      SELECT doc_id, lang,
             -- exact hash_split_bounds integers (rational floor at 2^60):
             -- decimal CAST would ROUND and disagree with the engine
             CASE WHEN hh < 115292150460684697
                    THEN 'test'
                  WHEN hh < 1037629354146162278
                    THEN 'train'
                  ELSE 'val' END AS split
      FROM h
    )
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM labeled GROUP BY split, lang
    """,
)
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split (operators/
    sampling.py hash_split): labels are a pure function of the key
    hash — rerun-stable and leakage-free, vs randomSplit which is
    neither. Zero-shuffle projection; the query reports per-(split,
    lang) counts. Label boundaries are cumulative fractions in sorted
    label order over the 60-bit hash space, replayed exactly by the
    oracle."""
    from open_energy_data_server_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    out = hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("split", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


@query(
    "q_weighted_sample",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS DOUBLE)
          < (CAST('0.5' AS DOUBLE)
             * (CAST(n_chars AS DOUBLE)
                / CAST((SELECT MAX(n_chars) FROM documents) AS DOUBLE)))
            * 1152921504606846976.0
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row weight-proportional Bernoulli sampling (training-data
    mixing by quality/length weight): keep a document iff
    hash60(doc_id) < w·2⁶⁰ with w = 0.5 · n_chars / max(n_chars) —
    longer documents survive proportionally more often, rerun-stable,
    monotone in the weight (operators/sampling.py
    weighted_hash_sample). The normalizer is collected at plan-build
    time and embedded as a literal (the IVF/quantile
    prepared-statement pattern), so the sample itself is a ZERO-
    shuffle scan projection — at 100 TB the max comes from catalog
    stats or a prior pass, never a per-row join."""
    from open_energy_data_server_spark.operators.sampling import (
        weighted_hash_sample,
    )

    docs = load_table(spark, sf_dir, "documents")
    maxv = docs.agg(F.max("n_chars")).first()[0]
    if maxv is None:
        raise ValueError("weighted_sample: empty corpus (no n_chars to normalize by)")
    w = F.lit(0.5) * (F.col("n_chars").cast("double") / F.lit(float(maxv)))
    out = weighted_hash_sample(docs, "doc_id", w)
    return out.select("doc_id", "lang", "n_chars")


@query(
    "q_top_ngrams",
    oracle=f"""
    WITH {SQL_TOKS},{SQL_SHINGLES},
    c AS (SELECT s AS trigram, CAST(COUNT(*) AS BIGINT) AS df
          FROM sh GROUP BY s)
    SELECT trigram, df FROM c
    ORDER BY df DESC, trigram LIMIT 25
    """,
)
def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-25 word trigrams by document frequency — the
    LM-data diagnostic for boilerplate and over-represented phrasing
    (the corpus-wide companion to the per-doc top-bigram repetition
    gate). Shingles are per-doc distinct (textops.shingles, the
    n-gram-Jaccard primitive), so df counts documents, not
    occurrences.

    Plan: explode to skinny (trigram) rows → partial+final hash agg →
    global top-k as TakeOrderedAndProject (sort+limit pushes the k
    bound into every partition — the BM25 precedent; no
    single-partition global sort). Total order (df DESC, trigram)
    makes the LIMIT deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    # bind the token array BEFORE shingling: element_at inside the
    # shingle transform re-evaluates an unbound tokenize per element
    # (the round-6 quadratic lesson from repetition_signals)
    grams = docs.select(textops.tokens("text").alias("__t")).select(
        F.explode(textops.shingles(F.col("__t"), 3)).alias("trigram")
    )
    return (
        grams.groupBy("trigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .orderBy(F.col("df").desc(), F.col("trigram").asc())
        .limit(25)
    )


@query(
    "q_vocab_overlap",
    oracle=r"""
    WITH vocab AS (
      SELECT DISTINCT source,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
      FROM documents
    ),
    sz AS (SELECT source, COUNT(*) AS vs FROM vocab GROUP BY source),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM vocab a JOIN vocab b USING (tok)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, n_common,
           CAST(n_common AS DOUBLE)
             / CAST(LEAST(sa.vs, sb.vs) AS DOUBLE) AS overlap_coef,
           CAST(n_common AS DOUBLE)
             / CAST(sa.vs + sb.vs - n_common AS DOUBLE) AS jaccard
    FROM inter
    JOIN sz sa ON src_a = sa.source
    JOIN sz sb ON src_b = sb.source
    """,
)
def q_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap (Szymkiewicz–Simpson
    coefficient + Jaccard per source pair) — the corpus-composition
    diagnostic for training-data mixing: which sources duplicate each
    other's lexicon. Pair generation is an inverted token index
    (|vocab| skinny rows per source through ONE token-key join —
    never a sources² × vocab cross join; per-token fanout is bounded
    by |sources|, the same skew argument as the n-gram Jaccard
    df_cap). Per-source sizes broadcast onto the pair aggregate;
    ratios are single deterministic divisions of exact counts."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = docs.select(
        "source", F.explode(F.array_distinct(textops.tokens("text"))).alias("tok")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("vs"))
    a, b = vocab.alias("a"), vocab.alias("b")
    inter = (
        a.join(b, "tok")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("vs").alias("va"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("vs").alias("vb"))
    out = inter.join(F.broadcast(sa), "src_a").join(F.broadcast(sb), "src_b")
    return out.select(
        "src_a",
        "src_b",
        "n_common",
        (
            F.col("n_common").cast("double")
            / F.least("va", "vb").cast("double")
        ).alias("overlap_coef"),
        (
            F.col("n_common").cast("double")
            / (F.col("va") + F.col("vb") - F.col("n_common")).cast("double")
        ).alias("jaccard"),
    )


@query(
    "q_chunk_documents",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(s // 8 AS BIGINT) AS chunk_id,
           CAST(s AS BIGINT) AS start_tok,
           CAST(len(list_slice(t, s + 1, s + 16)) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(t, s + 1, s + 16), ' ') AS chunk_text
    FROM toks, LATERAL (SELECT unnest(range(0, len(t), 8)) AS s)
    """,
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking for retrieval/embedding prep: 16-token
    windows every 8 tokens, tail tokens always covered by a final
    short chunk (operators.textops.chunk_tokens). Pure per-row array
    projection — ZERO shuffle, scan-speed on any corpus, output
    co-partitioned with its input (the chunk→embed→ANN pipeline's
    first stage feeds q_ann_* and q_semdedup_pairs directly)."""
    docs = load_table(spark, sf_dir, "documents")
    return textops.chunk_tokens(docs, "doc_id", "text", window=16, stride=8)


@query(
    "q_char_diversity",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '[^\n]')) AS c
      FROM documents
    ),
    cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
    agg AS (
      SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n,
             CAST(SUM(k * (k - 1)) AS BIGINT) AS rep
      FROM cnt GROUP BY doc_id
    )
    SELECT doc_id, n AS n_chars_counted,
           CAST(1.0 AS DOUBLE)
             - (CAST(rep AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))
             AS simpson_diversity
    FROM agg WHERE n >= 2
    """,
)
def q_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson character-diversity per document — the entropy-style
    gibberish/repetition signal WITHOUT a logarithm: 1 − Σk(k−1)/n(n−1)
    (probability two random character draws differ), exact integer
    moments so the score is engine-bit-identical (the
    no-transcendentals determinism rule; Shannon entropy would drift
    in the last ulp). Complements the token-level distinct ratio in
    q_quality_filters with a sub-token signal. Plan: (doc, char)
    hash agg then doc hash agg — two map-side-combined exchanges on
    the doc key. (Integer headroom: exact while n² < 2⁶³ — fine to
    ~3 GB single documents.)"""
    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id",
        # [^\n] on BOTH engines — Java's '.' also excludes \r/ …,
        # RE2's only \n, so a bare dot diverges on CRLF documents
        F.explode(F.regexp_extract_all("text", F.lit(r"[^\n]"), F.lit(0))).alias("c"),
    )
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    agg = cnt.groupBy("doc_id").agg(
        F.sum("k").cast("bigint").alias("n"),
        F.sum(F.col("k") * (F.col("k") - 1)).cast("bigint").alias("rep"),
    )
    return agg.filter(F.col("n") >= 2).select(
        "doc_id",
        F.col("n").alias("n_chars_counted"),
        (
            F.lit(1.0)
            - (
                F.col("rep").cast("double")
                / (F.col("n") * (F.col("n") - 1)).cast("double")
            )
        ).alias("simpson_diversity"),
    )


@query(
    "q_repetition_signals",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    lists AS (
      SELECT doc_id, len(ws) AS n, len(list_distinct(ws)) AS nd,
             list_transform(ws[1:len(ws) - 1],
                            (x, i) -> x || ' ' || ws[i + 1]) AS bgs,
             list_transform(ws[1:len(ws) - 2],
                            (x, i) -> x || ' ' || ws[i + 1]
                                        || ' ' || ws[i + 2]) AS tgs
      FROM w
    ),
    big AS (SELECT doc_id, unnest(bgs) AS bg FROM lists),
    bigc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY 1, 2),
    bigt AS (
      SELECT doc_id, MAX(c) AS mx, CAST(SUM(c) AS BIGINT) AS tot
      FROM bigc GROUP BY 1
    )
    SELECT l.doc_id,
           CAST(l.n AS BIGINT) AS n_words,
           CASE WHEN l.n > 0 THEN
             CAST(1 AS DOUBLE)
               - CAST(l.nd AS DOUBLE) / CAST(l.n AS DOUBLE)
           END AS dup_word_frac,
           CASE WHEN bigt.tot > 0 THEN
             CAST(bigt.mx AS DOUBLE) / CAST(bigt.tot AS DOUBLE)
           END AS top_bigram_share,
           CASE WHEN len(l.tgs) > 0 THEN
             CAST(1 AS DOUBLE)
               - CAST(len(list_distinct(l.tgs)) AS DOUBLE)
                 / CAST(len(l.tgs) AS DOUBLE)
           END AS dup_trigram_frac
    FROM lists l
    LEFT JOIN bigt ON l.doc_id = bigt.doc_id
    """,
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher within-document repetition gates: duplicate-word
    fraction, most-frequent-bigram share, duplicate-trigram fraction —
    the filters every LLM curation pipeline applies before quality
    scoring. Routed through the Arrow exact kernel
    (operators/textkernel.py): same map-only zero-shuffle shape, same
    counts bit-for-bit (pinned against the retained relational form
    textops.repetition_signals by tests/test_textkernel.py — the
    higher-order-fold form is CodegenFallback, interpreted per array
    element, ~20× the per-document CPU); the oracle recomputes via
    explode + group, proving the fold."""
    docs = load_table(spark, sf_dir, "documents")
    return textkernel.repetition_signals(docs, "doc_id", "text")
