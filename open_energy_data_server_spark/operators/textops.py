"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (BASELINE.json north star): language
ID, quality scoring, token counting, document fingerprinting. All
built-in expressions (split / transform / aggregate / md5) — JVM-side,
no Python in the hot path, so a 100 TB documents table runs at scan
speed with zero shuffles for the per-doc features.

Cross-engine determinism: fingerprints use md5 (identical in DuckDB);
integer token arithmetic is exact; 60-bit hashes come from the first
15 hex chars of md5 so they stay positive in a signed 64-bit lane.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker sets for the n-gram/stopword heuristic language ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "zh": ("的", "是", "了", "在", "和"),
}

STOPWORDS = ("the", "a", "an", "of", "and", "or", "is", "in", "to", "for")


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    r"""Whitespace tokenization of lowercased text (split on \s+)."""
    return F.split(F.lower(F.trim(_c(col))), r"\s+")


def word_count_regex(col: Column | str, pattern: str = "[a-z0-9]+") -> Column:
    """BPE-ish regex token count — counts maximal word-char runs."""
    return F.size(F.regexp_extract_all(F.lower(_c(col)), F.lit(pattern), F.lit(0)))


def token_length_sum(toks: Column) -> Column:
    """Exact integer sum of token lengths (fold — order-stable ints)."""
    return F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda acc, x: acc + x
    ).cast("bigint")


def stopword_count(toks: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    stop = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))


def _ws_normalized(col: Column | str) -> Column:
    r"""``tokens()`` rebuilt as a string: lower+trim, every ``\s+`` run
    collapsed to one space — so token boundaries are exactly the single
    spaces and membership tests become anchored regex counts."""
    return F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " ")


def token_length_sum_text(col: Column | str) -> Column:
    r"""Codegen twin of ``token_length_sum(tokens(col))`` computed on
    the raw text: the sum of token lengths is the character count of
    the text with all ``\s`` removed (split consumes exactly the
    ``\s+`` runs; lower() is applied in both forms so any locale
    length edge hits both sides identically). Replaces an interpreted
    transform+aggregate HOF fold (CodegenFallback, one lambda eval per
    token) with one codegen regex pass — guide §4.1. Equality pinned
    bit-for-bit by tests/test_textkernel.py::test_codegen_text_twins
    (adversarial corpus incl. tabs/newlines/empty/NULL + sf0.01)."""
    return F.length(F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", "")).cast(
        "bigint"
    )


def stopword_count_text(
    col: Column | str, stopwords: tuple[str, ...] = STOPWORDS
) -> Column:
    r"""Codegen twin of ``stopword_count(tokens(col), stopwords)``
    computed on the raw text: pad the whitespace-normalized string
    with spaces and count ``" word"`` matches with a ``(?= )``
    lookahead, so every token equal to a stopword — including adjacent
    repeats ("a a") — counts exactly once and substrings ("father",
    "the.") never match. Java regex backtracks within the alternation,
    so prefix-ordered lists ("a"|"an"|"and") still match the longest
    token (membership is anchored on both sides). One codegen regex
    pass instead of an interpreted per-token ArrayFilter lambda —
    guide §4.1. Equality pinned by test_codegen_text_twins."""
    padded = F.concat(F.lit(" "), _ws_normalized(col), F.lit(" "))
    pat = " (?:" + "|".join(stopwords) + ")(?= )"
    return F.size(F.regexp_extract_all(padded, F.lit(pat), F.lit(0)))


def punct_count(col: Column | str) -> Column:
    return F.size(F.regexp_extract_all(_c(col), F.lit(r"[.,;:!?]"), F.lit(0)))


def quality_score(n_tokens: Column, n_chars: Column, n_stop: Column, n_punct: Column) -> Column:
    """Deterministic heuristic quality in [0,1]: rewards healthy token
    length and some stopword density, penalizes punctuation soup.
    (Float arithmetic only — every term is a per-row deterministic op.)
    """
    avg_len = n_chars / n_tokens
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / n_chars
    return F.least(
        F.lit(1.0),
        F.greatest(
            F.lit(0.0),
            F.lit(0.4) * F.least(avg_len / 8.0, F.lit(1.0))
            + F.lit(0.4) * F.least(stop_ratio * 5.0, F.lit(1.0))
            + F.lit(0.2) * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0))),
        ),
    )


def lang_scores(toks: Column) -> dict[str, Column]:
    """Marker-hit count per language (the n-gram heuristic)."""
    return {lang: stopword_count(toks, markers) for lang, markers in LANG_MARKERS.items()}


def predict_lang_from_scores(scores: dict[str, Column]) -> Column:
    """argmax over per-language score *columns* with a fixed tie order
    (dict order). Callers must pass already-materialized columns —
    passing raw score expressions here duplicates each one 2^k times
    through the CASE chain (measured 4× slowdown)."""
    best_lang = F.lit("und")
    best_score = F.lit(-1)
    for lang, score in scores.items():
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def fingerprint_md5(col: Column | str) -> Column:
    """Exact-content fingerprint."""
    return F.md5(_c(col))


def fingerprint_normalized(col: Column | str) -> Column:
    """Whitespace/case-insensitive content fingerprint — the exact-dedup
    key (collapse runs of whitespace, trim, lowercase, md5)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " "))


def chunk_tokens(
    df,
    id_col: str,
    text_col: str,
    window: int = 16,
    stride: int = 8,
):
    """Sliding-window document chunking (the RAG/embedding prep step):
    whitespace tokens → overlapping windows of ``window`` tokens every
    ``stride`` — chunk starts are ``0, stride, 2·stride, …`` for every
    start < n_tokens, so tail tokens always land in a (possibly short)
    final chunk. Pure per-row array projection (sequence + slice +
    concat_ws) — ZERO shuffle; chunking a 100 TB corpus runs at scan
    speed and the output is already partitioned like its input.

    Returns (id, chunk_id, start_tok, n_tokens, chunk_text).
    NULL-text docs yield no chunks (filtered before tokenization —
    otherwise greatest() would collapse the NULL token array to a
    single spurious empty chunk, diverging from the SQL twin whose
    range(len(NULL)) unnests to nothing)."""
    toks = tokens(text_col)
    d = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), toks.alias("__t")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__t") - 1, F.lit(0)), F.lit(stride)
    )
    e = d.select(
        id_col, "__t", F.posexplode(starts).alias("chunk_id", "__s")
    )
    chunk = F.slice("__t", F.col("__s") + 1, window)
    return e.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("__s").cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


# DIN 5007-2 German folding (ä→ae …) plus common Latin accents — the
# name-normalization step the reference hand-codes per crawler for
# region/station joins (/root/reference/crawler/nuts_mapper.py name
# fixes). Ordered list; the SQL twin must nest replace() in the SAME
# order. Uppercase variants first so nothing accented survives to a
# (potentially engine-divergent) unicode lower().
FOLD_MAP: list[tuple[str, str]] = [
    ("Ä", "Ae"), ("Ö", "Oe"), ("Ü", "Ue"),
    ("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss"),
    ("É", "E"), ("È", "E"), ("Ê", "E"),
    ("é", "e"), ("è", "e"), ("ê", "e"),
    ("À", "A"), ("Â", "A"), ("à", "a"), ("â", "a"),
    ("Ç", "C"), ("ç", "c"),
]


def fold_accents(col: Column | str) -> Column:
    """Accent/umlaut folding as a chain of exact replaces — pure
    codegen string ops, no locale dependence (DuckDB twin:
    ``sql_fold_accents``)."""
    c = _c(col)
    for a, b in FOLD_MAP:
        c = F.replace(c, F.lit(a), F.lit(b))
    return c


def sql_fold_accents(expr: str) -> str:
    """DuckDB twin of :func:`fold_accents` (same replace order)."""
    for a, b in FOLD_MAP:
        expr = f"replace({expr}, '{a}', '{b}')"
    return expr


def hash60(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative bigint — the shared base
    hash for minhash/simhash (DuckDB twin:
    ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (empty array when < n tokens).

    ``toks`` must be a BOUND array column (a named column or a
    just-projected alias), not an inline expression: ``element_at``
    inside the transform lambda re-evaluates an unbound expression per
    element — quadratic per document."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)])
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def quality_signals(df, id_col: str, text_col: str):
    """Gopher-style per-document quality signals + integer-arithmetic
    keep flag (no float thresholds → engine-exact): token counts,
    duplicate-token fraction, most-repeated-bigram mode, digit-char and
    URL counts. Signals are scan-shaped; the bigram mode is the one
    shuffle (id, gram). Returns every input column plus the signals."""
    tok = df.withColumn("__t", F.explode(F.array(tokens(text_col))))
    base = tok.select(
        "*",
        F.size("__t").alias("n_tokens"),
        F.size(F.array_distinct("__t")).alias("n_distinct_tokens"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '[0-9]', 0)")).alias("n_digit_chars"),
        F.size(F.expr(f"regexp_extract_all(lower({text_col}), 'https?://', 0)")).alias("n_urls"),
        F.length(text_col).alias("__n_chars"),
    )
    # NOT shingles() (it distincts) — the mode needs every occurrence
    grams = tok.filter(F.size("__t") >= 2).select(
        F.col(id_col).alias("__gid"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(F.col("__t"), i), F.element_at(F.col("__t"), i + 1)
                ),
            )
        ).alias("g"),
    )
    top = (
        grams.groupBy("__gid", "g")
        .count()
        .groupBy("__gid")
        .agg(F.max("count").alias("top_bigram_n"))
    )
    out = (
        base.join(top, base[id_col] == top["__gid"], "left")
        .drop("__gid", "__t")
        .withColumn("top_bigram_n", F.coalesce("top_bigram_n", F.lit(0)))
    )
    keep = (
        (F.col("n_tokens") >= 20)
        & (F.col("n_distinct_tokens") * 2 > F.col("n_tokens"))
        & (F.col("top_bigram_n") * 5 < F.col("n_tokens"))
        & (F.col("n_digit_chars") * 4 < F.col("__n_chars"))
    )
    return out.withColumn("keep", keep.cast("int"))


# PII scrub patterns — RE2/Java-regex common subset so the DuckDB
# oracle replays them byte-for-byte (curation-pipeline hygiene pass;
# no reference analog — part of the engine's training-data suite)
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d /-]{7,}\d"


def scrub_pii(col: Column | str, repl: str = "[REDACTED]") -> Column:
    """Chained regexp_replace: emails → IPv4s → phone-like digit runs.

    Order matters (the phone pattern would otherwise eat IP octets) and
    is part of the contract — the SQL twin applies the same three
    passes in the same order with the 'g' flag. Pure projection: a
    100 TB corpus scrubs at scan speed inside whole-stage codegen."""
    out = F.regexp_replace(_c(col), PII_EMAIL, repl)
    out = F.regexp_replace(out, PII_IPV4, repl)
    return F.regexp_replace(out, PII_PHONE, repl)


def sql_scrub_pii(expr: str, repl: str = "[REDACTED]") -> str:
    """DuckDB twin of scrub_pii (same order; 'g' flag because DuckDB
    replaces only the first match by default, Spark replaces all)."""
    out = f"regexp_replace({expr}, '{PII_EMAIL}', '{repl}', 'g')"
    out = f"regexp_replace({out}, '{PII_IPV4}', '{repl}', 'g')"
    return f"regexp_replace({out}, '{PII_PHONE}', '{repl}', 'g')"


def strip_boilerplate_lines(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_line: int = 8,
    min_docs: int = 2,
):
    """Corpus-level boilerplate removal (the CCNet/RefinedWeb line-
    frequency dedup every web-scale curation pipeline runs; no
    reference analog — training-data suite): a "line" (here a fixed
    ``words_per_line`` word window, since the synthetic corpus has no
    newlines) occurring in ≥ ``min_docs`` DISTINCT documents is
    boilerplate (headers, nav, license blurbs) and is dropped from
    every document.

    → (id_col, n_lines, n_dropped, cleaned_text).

    Scale shape: line explosion is map-only; the frequency pass
    shuffles 16-byte line hashes + doc ids (never text); the resulting
    boilerplate-hash set is tiny relative to the corpus (boilerplate is
    by definition repeated) → broadcast to a map-side flag join. Text
    crosses ZERO exchanges (r10): only the FLAGGED (doc, pos) pairs —
    boilerplate hits, a sliver by definition — aggregate per doc, join
    the document scan on the doc key (broadcast), and the rebuilt text
    is a positional higher-order filter over the line array (filter
    preserves array order, which IS pos order — no array_sort, no
    collect_list of text)."""
    nonempty = docs.filter(F.length(F.trim(F.col(text_col))) > 0)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_lines_expr = F.floor((F.size(words) - 1) / words_per_line).cast("int")
    lines_arr = F.transform(
        F.sequence(F.lit(0), n_lines_expr),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * words_per_line + 1, words_per_line)
        ),
    )
    lines = nonempty.select(
        F.col(id_col), F.posexplode(lines_arr).alias("pos", "line")
    )
    boiler = (
        lines.groupBy(F.md5("line").alias("__h"))
        .agg(F.count_distinct(id_col).alias("__d"))
        .filter(F.col("__d") >= min_docs)
        .select("__h", F.lit(True).alias("__is_boiler"))
    )
    # inner join keeps ONLY boilerplate positions — the sliver that
    # must cross an exchange; one (pos list) row per affected doc
    dropped = (
        lines.join(F.broadcast(boiler), F.md5(lines["line"]) == boiler["__h"])
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("__drop_pos"))
    )
    no_pos = F.array().cast("array<int>")
    dp = F.coalesce(F.col("__drop_pos"), no_pos)
    # every word belongs to exactly one line (line i = words
    # [i·wpl, i·wpl+wpl)), and both within- and between-line joins use
    # a single space — so the rebuilt text is the WORD array filtered
    # by line index, never re-materializing line strings map-side
    # membership is resolved once per LINE (O(n_lines·|dropped|)) and
    # the kept text is a flatten of kept-line SLICES of the word
    # array — pure array ops, no per-word lambda at all. The word /
    # dropped-pos / line-count expressions are materialized as
    # multi-referenced columns first: a single-use projection would be
    # collapsed back INSIDE the lambda and re-evaluated per element
    # (no CSE across lambda invocations — measured 0.605 s vs 0.177 s
    # for exactly that inlining with an element_at flag variant)
    kept_words = F.flatten(
        F.transform(
            F.filter(
                F.sequence(F.lit(0), F.col("__n0")),
                lambda i: ~F.array_contains(F.col("__dp"), i.cast("int")),
            ),
            lambda i: F.slice(
                F.col("__words"), i * words_per_line + 1, words_per_line
            ),
        )
    )
    # untouched docs (most of the corpus — boilerplate hits a sliver)
    # skip the rebuild entirely: their text is the word array verbatim,
    # and CASE evaluates lazily per row
    cleaned = F.when(
        F.size(F.col("__dp")) == 0, F.array_join(F.col("__words"), " ")
    ).otherwise(F.array_join(kept_words, " "))
    return (
        nonempty.join(dropped, id_col, "left")
        .select(
            F.col(id_col),
            words.alias("__words"),
            n_lines_expr.alias("__n0"),
            dp.alias("__dp"),
        )
        .select(
            F.col(id_col),
            (F.col("__n0").cast("bigint") + 1).alias("n_lines"),
            F.size("__dp").cast("bigint").alias("n_dropped"),
            cleaned.alias("cleaned_text"),
        )
    )


def bigram_lm_scores(df, id_col: str, text_col: str):
    """(doc_id, n_bigrams, lm_score): score every document under a
    bigram language model trained on the corpus ITSELF — the
    self-supervised fluency signal a CCNet-style pipeline buckets on
    (docs whose token transitions are rare in the corpus read as
    noise / boilerplate / wrong-language).

    lm_score = mean over a doc's bigrams of P(tok | prev) =
    c(prev,tok) / c(prev·) — kept as plain conditional probabilities
    (no log-perplexity: ln is transcendental and engine-dependent; the
    mean probability ranks documents the same way for bucketing, and
    stays inside the engine's exact-arithmetic determinism contract
    via the fixed-point sign·floor accumulation).

    Plan: tokenize → posexplode → lag window per doc (one exchange on
    doc_id) → bigram count hash agg (map-side combined, keys are the
    bigram domain not the corpus) → prefix totals as a second agg →
    two skinny joins back on the bigram key → per-doc fixed-point
    mean. Text itself never enters an exchange — only (doc_id, prev,
    tok) rows. Docs with fewer than two tokens have no bigrams and are
    absent from the output (the SQL twin behaves identically).
    """
    from pyspark.sql import Window

    from open_energy_data_server_spark.constants import SCALE
    from open_energy_data_server_spark.operators.similarity import fixed_round

    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(tokens(text_col)).alias("pos", "tok"),
        )
        .filter(F.col("tok") != "")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bgf = (
        toks.withColumn("prev", F.lag("tok").over(w))
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", "tok")
    )
    # the bigram stream feeds the count table, the prefix totals AND
    # the scoring join — persist it so the corpus is tokenized once,
    # not three times (the jaccard_pairs posting-stream precedent;
    # capped-FIFO registered so repeated calls don't accumulate)
    from pyspark import StorageLevel

    from open_energy_data_server_spark.operators._cache import register_persisted

    bgf = register_persisted(bgf.persist(StorageLevel.MEMORY_AND_DISK))
    bc = bgf.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("c_pt"))
    pc = bc.groupBy("prev").agg(F.sum("c_pt").cast("bigint").alias("c_p"))
    p = F.col("c_pt").cast("double") / F.col("c_p").cast("double")
    scored = bgf.join(bc, ["prev", "tok"]).join(pc, "prev").select("doc_id", p.alias("p"))
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        (
            (F.sum(fixed_round(F.col("p") * SCALE)).cast("double") / float(SCALE))
            / F.count(F.lit(1)).cast("double")
        ).alias("lm_score"),
    )


def max_equal_run(sorted_arr: Column) -> Column:
    """Longest run of equal adjacent elements in a SORTED array — i.e.
    the count of the most frequent element — as one ``aggregate`` fold
    (a pure projection: no explode, no shuffle). Empty array → 0."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(sorted_arr, init, step, lambda acc: acc["best"])


def repetition_signals(df, id_col: str, text_col: str):
    """Gopher-style WITHIN-document repetition gates (Rae et al. 2021
    §A1.1, public): excessive repetition predicts low-quality text.
    Word-level variants (the corpus is single-line):

    - ``dup_word_frac``      1 − |distinct words| / |words|
    - ``top_bigram_share``   count of the most frequent bigram / |bigrams|
    - ``dup_trigram_frac``   1 − |distinct trigrams| / |trigrams|

    Plan: ENTIRELY projection — the word array is materialized ONCE
    per row, n-grams come from LINEAR ``zip_with`` over shifted slices
    (an indexed-transform + element_at formulation re-evaluates the
    split per element — measured quadratic, 6.4 s vs 0.2 s at sf0.1),
    distinct counts via ``array_distinct``, the bigram mode via
    ``max_equal_run`` over ``sort_array`` — map-only, scales with scan
    bandwidth (no shuffle at any corpus size; the same shape
    chunk_documents uses). Fractions are single IEEE divisions of
    exact integer counts (oracle-hash-safe)."""
    stage = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("__ws")
    )
    ws = F.col("__ws")
    n = F.size(ws)
    # greatest(..., 0): slice() raises on negative lengths for 1-2 word docs
    pair_len = F.greatest(n - 1, F.lit(0))
    tri_len = F.greatest(n - 2, F.lit(0))
    sep = F.lit(" ")
    bigrams = F.zip_with(
        F.slice(ws, F.lit(1), pair_len),
        F.slice(ws, F.lit(2), pair_len),
        lambda a, b: F.concat(a, sep, b),
    )
    trigrams = F.zip_with(
        F.zip_with(
            F.slice(ws, F.lit(1), tri_len),
            F.slice(ws, F.lit(2), tri_len),
            lambda a, b: F.concat(a, sep, b),
        ),
        F.slice(ws, F.lit(3), tri_len),
        lambda ab, c: F.concat(ab, sep, c),
    )
    stage = stage.select(
        id_col,
        n.alias("__n"),
        F.size(F.array_distinct(ws)).alias("__nd"),
        bigrams.alias("__bg"),
        trigrams.alias("__tg"),
    )
    n = F.col("__n")
    n_big = F.size(F.col("__bg"))
    n_tri = F.size(F.col("__tg"))
    dup_word = F.when(
        n > 0,
        F.lit(1.0) - F.col("__nd").cast("double") / n.cast("double"),
    )
    top_big = F.when(
        n_big > 0,
        max_equal_run(F.sort_array(F.col("__bg"))).cast("double")
        / n_big.cast("double"),
    )
    dup_tri = F.when(
        n_tri > 0,
        F.lit(1.0)
        - F.size(F.array_distinct(F.col("__tg"))).cast("double")
        / n_tri.cast("double"),
    )
    return stage.select(
        F.col(id_col),
        n.cast("bigint").alias("n_words"),
        dup_word.alias("dup_word_frac"),
        top_big.alias("top_bigram_share"),
        dup_tri.alias("dup_trigram_frac"),
    )
