"""Lexical ranking conformance queries (operators/ranking.py): TF-IDF
keyword extraction, BM25 retrieval, unigram-familiarity bucketing —
the relevance/quality-ranking layer of the training-data curation
suite, each hash-verified against a DuckDB twin.

The oracles replay the exact arithmetic (rational idf, fixed-point
per-term sums — see the determinism note in operators/ranking.py) with
identical parenthesization, so doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators.ranking import (
    bm25_topk,
    familiarity_buckets,
    tfidf_topk,
)
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries._util import SCALE

# DuckDB twin of operators.ranking.doc_terms (tokenizer matches
# operators.textops.tokens: lower(trim()) split on \s+, drop empties)
SQL_TF = r"""
  tokx AS (
    SELECT doc_id AS doc,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
    FROM documents
  ),
  tf AS (
    SELECT doc, term, COUNT(*) AS tf FROM tokx WHERE term <> '' GROUP BY 1, 2
  ),
  dl AS (SELECT doc, SUM(tf) AS dl FROM tf GROUP BY 1)"""

_QUERY_TERMS = ("join", "hash", "window", "stream")


@query(
    "q_tfidf_topk",
    oracle=f"""
    WITH {SQL_TF},
    dfreq AS (SELECT term, COUNT(DISTINCT doc) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc, tf.term,
             (CAST(tf.tf AS DOUBLE) / CAST(dl.dl AS DOUBLE))
               * ((CAST(n_docs AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0))
               AS score
      FROM tf JOIN dl USING (doc) JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc AS doc_id, term, score, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc ORDER BY score DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (rational smoothed idf —
    the ``exact=True`` conformance variant; production default uses
    log idf). Plan: one generate + (doc,term) partial agg; the
    |vocab|-row df table and scalar N broadcast; WindowGroupLimit
    prunes to 3 rows/doc below the rank exchange."""
    docs = load_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, "doc_id", "text", k=3, exact=True)


@query(
    "q_bm25_search",
    oracle=f"""
    WITH {SQL_TF},
    qt AS (
      SELECT tf.doc, tf.term, tf.tf, dl.dl
      FROM tf JOIN dl USING (doc)
      WHERE term IN ('join', 'hash', 'window', 'stream')
    ),
    dfreq AS (SELECT term, COUNT(DISTINCT doc) AS df FROM qt GROUP BY 1),
    stats AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT SUM(dl) FROM dl) AS sum_dl,
             (SELECT COUNT(*) FROM dl) AS n_with_terms
    ),
    contrib AS (
      SELECT doc,
             CAST(ROUND((
               ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                  / (CAST(df AS DOUBLE) + 0.5))
               * ((CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
                  / (CAST(tf AS DOUBLE)
                     + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + CAST(0.75 AS DOUBLE)
                            * (CAST(dl AS DOUBLE)
                               / (CAST(sum_dl AS DOUBLE)
                                  / CAST(n_with_terms AS DOUBLE))))))
             ) * {SCALE}, 0) AS BIGINT) AS c
      FROM qt JOIN dfreq USING (term) CROSS JOIN stats
    ),
    per_doc AS (
      SELECT doc, CAST(SUM(c) AS DOUBLE) / {SCALE}.0 AS score
      FROM contrib GROUP BY doc
    )
    SELECT doc AS doc_id, score, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS rn
      FROM per_doc
    ) WHERE rn <= 10
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the bag-of-words query {join, hash, window,
    stream} (k1=1.2, b=0.75; rational RSJ idf — the conformance
    variant). Per-term tfs are array-filter projections (no explode);
    corpus stats are collected once at plan build and embedded as
    literals, so each execution is ONE tokenize scan plus the top-k
    window; per-term fixed-point contributions add as plain bigints
    (reduction-order-free by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, "doc_id", "text", list(_QUERY_TERMS), k=10, exact=True
    )


@query(
    "q_familiarity_buckets",
    oracle=f"""
    WITH {SQL_TF},
    uni AS (SELECT term, SUM(tf) AS cnt FROM tf GROUP BY 1),
    tot AS (SELECT SUM(cnt) AS total FROM uni),
    parts AS (
      SELECT doc, dl.dl,
             CAST(ROUND((CAST(tf.tf AS DOUBLE)
               * (CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)))
               * {SCALE}, 0) AS BIGINT) AS c
      FROM tf JOIN dl USING (doc) JOIN uni USING (term) CROSS JOIN tot
    ),
    sc AS (
      SELECT doc,
             (CAST(SUM(c) AS DOUBLE) / {SCALE}.0) / CAST(dl AS DOUBLE) AS score
      FROM parts GROUP BY doc, dl
    )
    SELECT doc AS doc_id, score,
           CAST(NTILE(3) OVER (ORDER BY score DESC, doc) AS INTEGER) AS bucket
    FROM sc
    """,
)
def q_familiarity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail corpus split by unigram-LM
    familiarity (log-free; operators/ranking.py docstring has the
    model). bucket 1 = head (most familiar), 3 = tail."""
    docs = load_table(spark, sf_dir, "documents")
    return familiarity_buckets(docs, "doc_id", "text", n_buckets=3)


@query(
    "q_quality_classifier",
    oracle=f"""
    WITH tokx AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    f AS (
      SELECT doc,
             (CAST('0x' || substr(md5(term), 1, 15) AS BIGINT) % 4096) AS fid
      FROM tokx WHERE term <> ''
    ),
    c AS (
      SELECT doc,
             CAST(ROUND(((CAST((fid * 2654435761) % 2147483648 AS DOUBLE)
                            / 2147483648.0) - 0.5) * {SCALE}, 0) AS BIGINT) AS c
      FROM f
    )
    SELECT doc AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           (CAST(SUM(c) AS DOUBLE) / {SCALE}.0) / CAST(COUNT(*) AS DOUBLE)
             AS score,
           ((CAST(SUM(c) AS DOUBLE) / {SCALE}.0) / CAST(COUNT(*) AS DOUBLE))
             >= 0.0 AS keep
    FROM c GROUP BY doc
    """,
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality-classifier inference (the
    model-based filter of modern curation pipelines): hashed-bucket
    features, plan-embedded weights, fixed-point per-doc mean score +
    keep flag (operators.ranking.linear_text_classifier — the
    conformance path runs the deterministic arithmetic pseudo-model;
    a trained export drops into the same plumbing)."""
    from open_energy_data_server_spark.operators.ranking import (
        linear_text_classifier,
    )

    docs = load_table(spark, sf_dir, "documents")
    return linear_text_classifier(docs, "doc_id", "text", n_features=4096)
