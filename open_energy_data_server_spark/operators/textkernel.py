"""Arrow-batched exact text-statistics kernels (optimization guide
§4.2: hand whole batches to vectorized native code instead of
evaluating per-row expression trees).

Why this module exists: the map-only token-fold queries
(repetition_signals and friends) are expressed as higher-order
array functions — ``zip_with`` n-grams, ``aggregate`` folds,
``array_distinct`` — which are CodegenFallback expressions: Catalyst
evaluates them INTERPRETED, one array element at a time, with
per-element object allocation (~56 µs/doc measured at sf0.1, the
whole cost of q_repetition_signals). The kernels here compute the
SAME counts with dictionary-encode + sorted-key segment counting in
Arrow/NumPy (~2-4 µs/doc), keeping the map-only zero-shuffle shape.

Exactness contract (the DuckDB oracle hashes must not move):

- tokenization is ``split(text, ' ')`` with Java ``limit=-1``
  semantics — every adjacent-separator and leading/trailing empty
  token kept; ``pyarrow.compute.split_pattern`` implements exactly
  that split (pinned by tests against the relational form, including
  '' and multi-space inputs);
- every published count (n_words, distinct words, bigram
  multiplicities, distinct trigrams) is an EXACT integer: n-gram
  equality over space-joined tokens ≡ equality of token-code tuples
  because tokens cannot contain the joining space;
- the only float arithmetic is the final divisions — single
  correctly-rounded IEEE-754 ops applied to exact integers in the
  same order as the JVM expression (``1.0 - nd/n``, ``best/n_big``);
- NULL text rows yield all-NULL outputs exactly like the relational
  projection (size(NULL) → NULL under the engine's sizeOfNull pin);
  NaN encodes NULL across the Arrow boundary and no legitimate NaN
  can arise (denominators are > 0 wherever a division happens).

Pinned row-for-row against ``textops.repetition_signals`` (the
retained relational form) by tests/test_textkernel.py, and by the
unchanged DuckDB oracle of q_repetition_signals.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Iterator

from pyspark.sql import DataFrame

# Per-task document-volume crossover for routing kernel vs relational
# (round-10 measurement, re-verified round 11): the mapInPandas runner
# pays a fixed ~0.1-0.25 s of per-task IPC/startup, so the kernel only
# wins once a task carries enough documents to amortize it — measured
# break-even ~10k docs/task, kernel 1.4-1.8× ahead at 12.5k, and the
# driver's own bench showed the kernel LOSING at sf0.1 (5k docs, 1-3
# tasks) and scale10 (2.5k docs/task). 20k keeps a safety margin; a
# production 128 MB split carries ~10⁵-10⁶ docs, far past it.
_KERNEL_MIN_ROWS_PER_TASK = int(
    os.environ.get("SPARK_OEDS_TEXTKERNEL_MIN_ROWS_PER_TASK", "20000")
)


def est_rows_per_task(spark, path: str) -> float | None:
    """Estimate how many rows of the parquet table at ``path`` (single
    file or directory of part files) each scan TASK will carry, by
    replaying Spark's own split math (FilePartition.maxSplitBytes:
    ``max(openCost, min(maxPartitionBytes, totalWithOpen /
    defaultParallelism))``). Row counts come from parquet footers —
    driver-side metadata reads, no job. Returns None when the path
    cannot be inspected (caller picks its safe default)."""
    try:
        import pyarrow.parquet as pq

        files = (
            sorted(_glob.glob(os.path.join(path, "*.parquet")))
            if os.path.isdir(path)
            else [path]
        )
        if not files:
            return None
        total = sum(os.path.getsize(f) for f in files)
        rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        def _bytes(v: str, dflt: int) -> int:
            m = __import__("re").fullmatch(
                r"(\d+)\s*([kmgt]?)b?", v.strip().lower()
            )
            if not m:
                return dflt
            return int(m.group(1)) * 1024 ** " kmgt".index(m.group(2) or " ")

        open_cost = _bytes(
            spark.conf.get("spark.sql.files.openCostInBytes", "4m"),
            4 * 1024 * 1024,
        )
        max_pb = _bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"),
            128 * 1024 * 1024,
        )
        par = max(spark.sparkContext.defaultParallelism, 1)
        with_open = total + len(files) * open_cost
        max_split = max(open_cost, min(max_pb, with_open // par))
        n_tasks = max(1, round(with_open / max(max_split, 1)))
        return rows / n_tasks
    except Exception:
        return None


def kernel_pays_off(spark, path: str) -> bool:
    """True when the estimated per-task document volume is past the
    Python-boundary crossover, i.e. the Arrow kernel beats the
    relational expression form. Routing is a pure performance choice:
    both forms are pinned bit-identical by tests/test_textkernel.py,
    so either answer is correct. Unknown volume → False (the
    relational form's worst case is a bounded CPU factor; the
    kernel's worst case is paying the IPC floor for a handful of
    rows)."""
    est = est_rows_per_task(spark, path)
    return est is not None and est >= _KERNEL_MIN_ROWS_PER_TASK


def _rep_signals_pdf(pdf, id_col: str, text_col: str):
    """Exact repetition signals for one Arrow batch (see module doc)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    n_rows = len(pdf)
    texts = pa.Array.from_pandas(pdf[text_col])
    # NaN-filled outputs; NaN → NULL across the Arrow boundary
    n_out = np.full(n_rows, np.nan)
    dupw = np.full(n_rows, np.nan)
    topb = np.full(n_rows, np.nan)
    dupt = np.full(n_rows, np.nan)

    valid = np.asarray(pc.is_valid(texts))
    if valid.any():
        toks = pc.split_pattern(texts.drop_null(), " ")
        n = np.asarray(pc.list_value_length(toks)).astype(np.int64)
        nv = int(n.sum())
        codes = np.asarray(toks.flatten().dictionary_encode().indices).astype(
            np.int64
        )
        k = int(codes.max()) + 1 if nv else 1
        ndocs = len(n)
        doc = np.repeat(np.arange(ndocs, dtype=np.int64), n)

        # distinct words per doc: unique (doc, token-code) pairs
        uk = np.unique(doc * k + codes)
        nd = np.bincount(uk // k, minlength=ndocs)

        # bigrams: adjacent token pairs within one doc
        same = doc[:-1] == doc[1:]
        bkey = codes[:-1][same] * k + codes[1:][same]
        bdoc = doc[:-1][same]
        n_big = n - 1  # every valid doc has >= 1 token
        best = np.zeros(ndocs, dtype=np.int64)
        if len(bkey):
            ub, binv = np.unique(bkey, return_inverse=True)
            k2 = len(ub)
            udk, cnts = np.unique(bdoc * k2 + binv, return_counts=True)
            owner = udk // k2  # sorted, one segment per doc with bigrams
            seg = np.flatnonzero(np.r_[True, owner[1:] != owner[:-1]])
            best[owner[seg]] = np.maximum.reduceat(cnts, seg)

        # trigrams: distinct count per doc via two-level code pairing
        same3 = same[:-1] & same[1:]
        n_tri = np.maximum(n - 2, 0)
        nd_tri = np.zeros(ndocs, dtype=np.int64)
        if same3.any():
            ta = codes[:-2][same3]
            tb = codes[1:-1][same3]
            tc = codes[2:][same3]
            td = doc[:-2][same3]
            _, pinv = np.unique(ta * k + tb, return_inverse=True)
            utk, tinv = np.unique(pinv * k + tc, return_inverse=True)
            k3 = len(utk)
            u3 = np.unique(td * k3 + tinv)
            nd_tri = np.bincount(u3 // k3, minlength=ndocs)

        nf = n.astype(np.float64)
        n_out[valid] = nf
        dupw[valid] = 1.0 - nd.astype(np.float64) / nf
        with np.errstate(invalid="ignore", divide="ignore"):
            tb_sub = best.astype(np.float64) / n_big.astype(np.float64)
            tb_sub[n_big <= 0] = np.nan
            tg_sub = 1.0 - nd_tri.astype(np.float64) / n_tri.astype(
                np.float64
            )
            tg_sub[n_tri <= 0] = np.nan
        topb[valid] = tb_sub
        dupt[valid] = tg_sub

    return pd.DataFrame(
        {
            id_col: pdf[id_col],
            "n_words": pd.Series(n_out).astype("Int64"),
            "dup_word_frac": dupw,
            "top_bigram_share": topb,
            "dup_trigram_frac": dupt,
        }
    )


_JAVA_WS = "[ \\t\\n\\x0b\\f\\r]+"  # Java regex \s+ spelled for RE2
# (RE2's \s omits \x0b vertical tab; Java's default \s includes it)


def _tokenize_ws(texts_valid):
    """``textops.tokens`` twin over an Arrow string array WITHOUT
    nulls: split(lower(trim-space(text)), \\s+) with Java semantics —
    trim strips 0x20 only, split keeps leading/trailing empty tokens
    (limit=-1). Returns (ListArray, flat token codes int64, dictionary
    values as a python list, per-doc lengths int64)."""
    import numpy as np
    import pyarrow.compute as pc

    low = pc.utf8_lower(pc.utf8_trim(texts_valid, " "))
    # Exactness-safe fast path: when no text contains a non-space
    # whitespace char or an adjacent-separator run (one cheap scan),
    # the literal single-space split is IDENTICAL to the \s+ regex
    # split (trim already removed leading/trailing 0x20, so runs and
    # exotic whitespace are the only ways the two can differ) — and
    # ~6× cheaper in RE2.
    exotic = pc.any(
        pc.match_substring_regex(low, "[\\t\\n\\x0b\\f\\r]|  ")
    ).as_py()
    if exotic:
        toks = pc.split_pattern_regex(low, _JAVA_WS)
    else:
        toks = pc.split_pattern(low, " ")
    n = np.asarray(pc.list_value_length(toks)).astype(np.int64)
    dic = toks.flatten().dictionary_encode()
    codes = np.asarray(dic.indices).astype(np.int64)
    return toks, codes, dic.dictionary, n


def _member_counts(codes, vocab, n, members) -> "object":
    """Per-doc count of tokens whose value is in ``members`` — exact
    integer counts via a vocabulary-sized lookup table. ``vocab`` is
    the Arrow dictionary array; membership is resolved natively
    (``index_in`` of the few member strings into the vocabulary —
    never a Python loop over the vocabulary)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    lut = np.zeros(len(vocab), dtype=bool)
    idx = pc.index_in(
        pa.array(sorted(members), type=pa.string()), value_set=vocab
    ).drop_null()
    if len(idx):
        lut[np.asarray(idx).astype(np.int64)] = True
    doc = np.repeat(np.arange(len(n), dtype=np.int64), n)
    hits = lut[codes] if len(codes) else np.zeros(0, dtype=bool)
    return np.bincount(doc[hits], minlength=len(n)).astype(np.int64)


def _text_stats_pdf(pdf, id_col: str, text_col: str):
    """Exact twin of the q_text_stats projection (see textops.tokens /
    word_count_regex / token_length_sum / stopword_count / punct_count
    / quality_score). NULL-text rows replay the relational NULL
    algebra: every count NULL, quality = 0.8 (least/greatest skip the
    NULL terms — pinned by tests)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from open_energy_data_server_spark.operators.textops import STOPWORDS

    n_rows = len(pdf)
    texts = pa.Array.from_pandas(pdf[text_col])
    out = {
        k: np.full(n_rows, np.nan)
        for k in (
            "n_tokens", "n_words", "n_chars", "token_len_sum", "n_stop",
            "n_punct", "quality",
        )
    }
    # NULL text: 0.4*least(NULL,1) + 0.4*least(NULL,1) + 0.2*(1-least(NULL,1))
    out["quality"][:] = min(1.0, max(0.0, 0.4 * 1.0 + 0.4 * 1.0 + 0.2 * (1.0 - 1.0)))

    valid = np.asarray(pc.is_valid(texts))
    if valid.any():
        raw = texts.drop_null()
        toks, codes, vocab, n = _tokenize_ws(raw)
        doc = np.repeat(np.arange(len(n), dtype=np.int64), n)
        tok_len = np.asarray(pc.utf8_length(toks.flatten())).astype(np.int64)
        # int sums are exact in float64 far below 2^53
        len_sum = np.bincount(doc, weights=tok_len, minlength=len(n)).astype(
            np.int64
        )
        n_words = np.asarray(
            pc.count_substring_regex(pc.utf8_lower(raw), "[a-z0-9]+")
        ).astype(np.int64)
        n_chars = np.asarray(pc.utf8_length(raw)).astype(np.int64)
        n_stop = _member_counts(codes, vocab, n, frozenset(STOPWORDS))
        n_punct = np.asarray(
            pc.count_substring_regex(raw, "[.,;:!?]")
        ).astype(np.int64)

        # quality_score, op for op (n_tokens >= 1 always: split yields
        # at least one token; punct ratio's 0-denominator division is
        # NULL in Spark, skipped by least → the 1.0 branch)
        nt = n.astype(np.float64)
        nc = n_chars.astype(np.float64)
        t1 = np.minimum((nc / nt) / 8.0, 1.0)
        t2 = np.minimum((n_stop.astype(np.float64) / nt) * 5.0, 1.0)
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.minimum((n_punct.astype(np.float64) / nc) * 10.0, 1.0)
        pr[n_chars <= 0] = 1.0
        q = np.minimum(
            1.0, np.maximum(0.0, 0.4 * t1 + 0.4 * t2 + 0.2 * (1.0 - pr))
        )

        out["n_tokens"][valid] = n
        out["n_words"][valid] = n_words
        out["n_chars"][valid] = n_chars
        out["token_len_sum"][valid] = len_sum
        out["n_stop"][valid] = n_stop
        out["n_punct"][valid] = n_punct
        out["quality"][valid] = q

    cols = {id_col: pdf[id_col]}
    for k in ("n_tokens", "n_words", "n_chars", "token_len_sum", "n_stop",
              "n_punct"):
        cols[k] = pd.Series(out[k]).astype("Int64")
    cols["quality"] = out["quality"]
    return pd.DataFrame(cols)


def text_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Arrow-kernel twin of the q_text_stats projection — same columns,
    same values bit-for-bit (pinned by tests/test_textkernel.py)."""
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_tokens bigint, n_words bigint, "
        "n_chars bigint, token_len_sum bigint, n_stop bigint, "
        "n_punct bigint, quality double"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _text_stats_pdf(pdf, id_col, text_col)

    return df.select(id_col, text_col).mapInPandas(gen, schema)


def _lang_id_pdf(pdf, id_col: str, lang_col: str, text_col: str):
    """Exact twin of the q_lang_id projection: per-language marker-hit
    counts + the fixed-tie-order argmax (first language with the
    maximum score wins — matches the strict-> CASE chain, whose -1
    seed every count beats). NULL text → all scores NULL, predicted
    'und' (NULL > -1 is NULL → every CASE keeps the seed)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from open_energy_data_server_spark.operators.textops import LANG_MARKERS

    n_rows = len(pdf)
    texts = pa.Array.from_pandas(pdf[text_col])
    langs = list(LANG_MARKERS)
    score_out = {
        lang: np.full(n_rows, np.nan) for lang in ("en", "de")
    }
    pred = np.full(n_rows, "und", dtype=object)

    valid = np.asarray(pc.is_valid(texts))
    if valid.any():
        _, codes, vocab, n = _tokenize_ws(texts.drop_null())
        scores = np.stack(
            [
                _member_counts(codes, vocab, n, frozenset(LANG_MARKERS[lang]))
                for lang in langs
            ]
        )  # (n_langs, n_valid)
        best = np.argmax(scores, axis=0)  # first max — the CASE-chain order
        pred[valid] = np.asarray(langs, dtype=object)[best]
        for lang in score_out:
            score_out[lang][valid] = scores[langs.index(lang)]

    return pd.DataFrame(
        {
            id_col: pdf[id_col],
            "labeled_lang": pdf[lang_col],
            "predicted_lang": pred,
            "score_en": pd.Series(score_out["en"]).astype("Int64"),
            "score_de": pd.Series(score_out["de"]).astype("Int64"),
        }
    )


def lang_id(df: DataFrame, id_col: str, lang_col: str, text_col: str) -> DataFrame:
    """Arrow-kernel twin of the q_lang_id projection — same columns,
    same values (pinned by tests/test_textkernel.py)."""
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, labeled_lang string, predicted_lang string, "
        "score_en bigint, score_de bigint"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _lang_id_pdf(pdf, id_col, lang_col, text_col)

    return df.select(id_col, lang_col, text_col).mapInPandas(gen, schema)


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Arrow-kernel twin of ``textops.repetition_signals`` — same
    columns, same values bit-for-bit (exactness contract in the module
    docstring), same map-only zero-shuffle plan shape, ~20× less
    per-document CPU. Only (id, text) cross the Python boundary."""
    id_type = df.schema[id_col].dataType.simpleString()
    schema = (
        f"{id_col} {id_type}, n_words bigint, dup_word_frac double, "
        "top_bigram_share double, dup_trigram_frac double"
    )

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield _rep_signals_pdf(pdf, id_col, text_col)

    return df.select(id_col, text_col).mapInPandas(gen, schema)
