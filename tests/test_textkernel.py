"""Exactness pins for the Arrow text kernels
(operators/textkernel.py): the kernel must reproduce the retained
relational form BIT-FOR-BIT — same NULL placement, same float bits —
on adversarial token shapes and on the real corpus. The DuckDB oracle
of every routed query is unchanged; these pins are what license the
routing."""

from __future__ import annotations

import math

from open_energy_data_server_spark.operators import textkernel, textops

ADVERSARIAL = [
    (1, "a b a b a b"),   # repeated bigram
    (2, "x y z"),         # all distinct
    (3, "w"),             # single word: no bigrams/trigrams
    (4, "q q q q"),       # total repetition
    (5, None),            # NULL text → all NULL
    (6, ""),              # empty string: one empty token
    (7, "a  b"),          # double space: empty token in the middle
    (8, " a"),            # leading space: leading empty token
    (9, "a "),            # trailing space: trailing empty token
    (10, "  "),           # spaces only: three empty tokens
    (11, "a b c a b c a b"),
    (12, "solo solo"),
]


def _rows(df):
    return {
        r[0]: tuple(r) for r in df.collect()
    }


def _assert_bitwise_equal(got, want, ctx):
    assert got.keys() == want.keys(), ctx
    for key in want:
        g, w = got[key], want[key]
        assert len(g) == len(w), (ctx, key)
        for i, (a, b) in enumerate(zip(g, w)):
            if isinstance(b, float):
                ok = (
                    a is not None
                    and math.isnan(a) == math.isnan(b)
                    and (math.isnan(b) or a == b)
                )
            else:
                ok = a == b
            assert ok, (ctx, key, i, a, b)


def test_repetition_signals_kernel_equals_relational_adversarial(spark):
    docs = spark.createDataFrame(ADVERSARIAL, "doc_id bigint, text string")
    got = _rows(textkernel.repetition_signals(docs, "doc_id", "text"))
    want = _rows(textops.repetition_signals(docs, "doc_id", "text"))
    _assert_bitwise_equal(got, want, "adversarial corpus")


def test_repetition_signals_kernel_equals_relational_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = _rows(textkernel.repetition_signals(docs, "doc_id", "text"))
    want = _rows(textops.repetition_signals(docs, "doc_id", "text"))
    _assert_bitwise_equal(got, want, "sf0.01 corpus")


WS_ADVERSARIAL = ADVERSARIAL + [
    # \s+-tokenizer edges: trim strips 0x20 only, so tabs/newlines
    # survive into the split; mixed case exercises lower-before-split
    (20, "\tThe  of\nand"),
    (21, "Hello, world! Is this; good: yes? No."),
    (22, "der die das und ist"),
    (23, "the el le 的 und"),
    (24, "\x0bvtab separated\x0btokens"),
    (25, "UPPER lower MiXeD 123 a1b2"),
    (26, "trailing tab\t"),
    # regex-twin edges (textops.*_text): adjacent stopwords must each
    # count (zero-width lookahead), substrings/punct-glued tokens must
    # not ("father", "the."), prefix-ordered alternation must still
    # take the longer token ("an", "and"), regex metachars in the TEXT
    # are subject-side only, and stopwords at string edges hit the pad
    (27, "the the the"),
    (28, "father of and androids"),
    (29, "a an and of A AN"),
    (30, "(the) [a] {of} the. ?a !an"),
    (31, "the\nof\tand\x0cin"),
    (32, "the"),
]


def _lang_docs(spark, rows):
    return spark.createDataFrame(
        [(i, "en", t) for i, t in rows], "doc_id bigint, lang string, text string"
    )


def test_text_stats_kernel_equals_relational(spark):
    from open_energy_data_server_spark.queries.llm_text import (
        text_stats_relational,
    )

    docs = spark.createDataFrame(WS_ADVERSARIAL, "doc_id bigint, text string")
    got = _rows(textkernel.text_stats(docs, "doc_id", "text"))
    want = _rows(text_stats_relational(docs))
    _assert_bitwise_equal(got, want, "text_stats adversarial")

    real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = _rows(textkernel.text_stats(real, "doc_id", "text"))
    want = _rows(text_stats_relational(real))
    _assert_bitwise_equal(got, want, "text_stats sf0.01")


def test_lang_id_kernel_equals_relational(spark):
    from open_energy_data_server_spark.queries.llm_text import (
        lang_id_relational,
    )

    docs = _lang_docs(spark, [(i, t) for i, t in WS_ADVERSARIAL])
    got = _rows(textkernel.lang_id(docs, "doc_id", "lang", "text"))
    want = _rows(lang_id_relational(docs))
    _assert_bitwise_equal(got, want, "lang_id adversarial")

    real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = _rows(textkernel.lang_id(real, "doc_id", "lang", "text"))
    want = _rows(lang_id_relational(real))
    _assert_bitwise_equal(got, want, "lang_id sf0.01")


def test_codegen_text_twins(spark):
    """The round-11 codegen regex twins (textops.token_length_sum_text
    / stopword_count_text) must equal the interpreted HOF fold forms
    BIT-FOR-BIT — including NULL placement — on the adversarial corpus
    and on the real sf0.01 corpus. These pins are what license the
    relational forms using the twins."""
    from pyspark.sql import functions as F

    def both(docs):
        t = textops.tokens("text")
        fold = docs.select(
            "doc_id",
            textops.token_length_sum(t).alias("tls"),
            textops.stopword_count(t).cast("bigint").alias("n_stop"),
            *[
                textops.stopword_count(t, m).cast("bigint").alias(f"s_{lang}")
                for lang, m in textops.LANG_MARKERS.items()
            ],
        )
        twin = docs.select(
            "doc_id",
            textops.token_length_sum_text("text").alias("tls"),
            textops.stopword_count_text("text").cast("bigint").alias("n_stop"),
            *[
                textops.stopword_count_text("text", m)
                .cast("bigint")
                .alias(f"s_{lang}")
                for lang, m in textops.LANG_MARKERS.items()
            ],
        )
        return fold, twin

    docs = spark.createDataFrame(WS_ADVERSARIAL, "doc_id bigint, text string")
    fold, twin = both(docs)
    _assert_bitwise_equal(_rows(twin), _rows(fold), "twins adversarial")

    real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fold, twin = both(real.select("doc_id", "text"))
    _assert_bitwise_equal(_rows(twin), _rows(fold), "twins sf0.01")


def test_lang_id_regex_not_duplicated(spark):
    """The argmax CASE chain references each score column ~4×; the
    optimizer must NOT inline the non-cheap regexp_extract_all into
    the chain (2^k blowup). Exactly one extraction per language in
    the executed plan."""
    from open_energy_data_server_spark.queries.llm_text import (
        lang_id_relational,
    )

    docs = _lang_docs(spark, [(i, t) for i, t in WS_ADVERSARIAL])
    plan = (
        lang_id_relational(docs)._jdf.queryExecution().executedPlan().toString()
    )
    n = plan.count("regexp_extract_all")
    assert n == len(textops.LANG_MARKERS), (n, plan[:2000])


def test_repetition_signals_kernel_plan_shape(spark):
    """Map-only contract: no Exchange, single scan, only (id, text)
    cross the Python boundary."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = textkernel.repetition_signals(docs, "doc_id", "text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1
    assert "MapInPandas" in plan
    # column pruning reached the scan: the opaque op sees a 2-col select
    assert "text" in plan.split("Scan parquet")[0] or "ReadSchema" in plan
