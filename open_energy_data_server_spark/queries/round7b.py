"""Round-7 additions, part 2: sequence analytics and hybrid retrieval.

Sequence analytics over the events stream — the reference's crawled
series are *behavioral* logs as much as measurements
(/root/reference/crawler/tankerkoenig.py price-change events,
opsd/entsoe load series — and q_event_transitions in analytics.py
already models their first-order structure): q_gaps_islands is the
classic streak/outage detector — consecutive active days per series,
the relational dual of q_data_gaps' missing-interval sweep (the
ordered-funnel counterpart already lives in operators/funnel.py /
q_funnel_steps).

q_rrf_hybrid_search completes the LLM retrieval kit: reciprocal-rank
fusion (Cormack et al., the de-facto hybrid-search combiner) of a
lexical term-frequency ranker over ``documents`` with an exact-cosine
ranker over ``embeddings`` (doc_id ≡ vec_id in the testdata). Both
candidate lists are bounded top-100 BEFORE fusion — at 100 TB each
ranker is an independently-bounded top-k (WindowGroupLimit /
bucketed ANN), and fusion touches ≤ 2k candidate rows, never the
corpus.

Determinism: counts/ranks are ints; cosine uses the fixed-point dot
(operators.similarity.fixed_dot — bit-identical in DuckDB via the
sign·floor(|z|+0.5) twin); RRF scores are fixed-shape double
expressions of ints (1/(60+r) sums in a fixed order), identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators import textops
from open_energy_data_server_spark.operators.similarity import (
    fixed_dot,
    fixed_norm2,
)
from open_energy_data_server_spark.queries import query
from open_energy_data_server_spark.queries.llm_similarity import SQL_COMP, _FS


@query(
    "q_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    numbered AS (
      SELECT user_id, d,
             DATE_DIFF('day', DATE '1970-01-01', d)
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
               AS grp
      FROM days
    ),
    islands AS (
      SELECT user_id, grp, COUNT(*) AS streak_days
      FROM numbered GROUP BY 1, 2
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(MAX(streak_days) AS BIGINT) AS longest_streak,
           CAST(SUM(streak_days) AS BIGINT) AS active_days
    FROM islands GROUP BY user_id
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands per series: collapse each user's active days
    into maximal consecutive runs (epoch-day − row_number is constant
    within a run), then count runs, the longest streak, and total
    active days — the streak-side dual of q_data_gaps' missing-
    interval sweep (a crawler that reports *intermittently* shows up
    here as many short islands).

    Scale: distinct and window and both aggs all hash by user_id —
    AQE reuses one exchange for the whole chain; per-series state is
    |active days|, never raw rows."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    numbered = days.withColumn(
        "grp",
        F.datediff(F.col("d"), F.lit("1970-01-01")) - F.row_number().over(w),
    )
    islands = numbered.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_days")
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("streak_days").cast("bigint").alias("longest_streak"),
        F.sum("streak_days").cast("bigint").alias("active_days"),
    )


_RRF_K = 60
_RRF_TERMS = ("join", "hash", "window", "stream")
_CAND_K = 100
_FUSED_K = 20


@query(
    "q_rrf_hybrid_search",
    oracle=f"""
    WITH lex_scored AS (
      SELECT doc_id,
             len(list_filter(
               string_split_regex(lower(trim(text)), '\\s+'),
               t -> t IN ({", ".join(f"'{t}'" for t in _RRF_TERMS)})))
               AS lex_score
      FROM documents WHERE doc_id <> 0
    ),
    lex AS (
      SELECT doc_id, CAST(rn AS INTEGER) AS lex_rank FROM (
        SELECT doc_id, ROW_NUMBER() OVER (
          ORDER BY lex_score DESC, doc_id) AS rn
        FROM lex_scored WHERE lex_score > 0
      ) WHERE rn <= {_CAND_K}
    ),
    {SQL_COMP},
    norms AS (
      SELECT vid, {_FS.format(expr="val * val")} AS norm2 FROM comp GROUP BY vid
    ),
    q AS (SELECT pos, val AS qval FROM comp WHERE vid = 0),
    dots AS (
      SELECT c.vid, {_FS.format(expr="c.val * q.qval")} AS dot
      FROM comp c JOIN q ON c.pos = q.pos
      WHERE c.vid <> 0 GROUP BY c.vid
    ),
    vec AS (
      SELECT vid AS doc_id, CAST(rn AS INTEGER) AS vec_rank FROM (
        SELECT d.vid, ROW_NUMBER() OVER (
          ORDER BY d.dot / (SQRT(nq.norm2) * SQRT(nn.norm2)) DESC, d.vid) AS rn
        FROM dots d
        JOIN norms nn ON d.vid = nn.vid
        CROSS JOIN (SELECT norm2 FROM norms WHERE vid = 0) nq
      ) WHERE rn <= {_CAND_K}
    ),
    fused AS (
      SELECT COALESCE(lex.doc_id, vec.doc_id) AS doc_id,
             lex.lex_rank, vec.vec_rank,
             COALESCE(1.0 / ({_RRF_K} + lex.lex_rank), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + vec.vec_rank), 0.0) AS rrf_score
      FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank, rrf_score,
           CAST(rn AS INTEGER) AS fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= {_FUSED_K}
    """,
)
def q_rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion: a lexical ranker
    (term-frequency of the bag-of-words query, no explode) and an
    exact-cosine ranker against the query document's embedding
    (vec_id 0) each produce a bounded top-k (_CAND_K = 100) candidate
    list; RRF (k = _RRF_K = 60) fuses them and returns the top
    _FUSED_K = 20.

    Scale: each ranker is independently top-k-bounded BEFORE fusion —
    the lexical side is one tokenize scan + WindowGroupLimit, the
    vector side one corpus scan with an in-row fixed-point dot fold
    (at 100 TB it becomes the bucketed-ANN probe, same contract);
    fusion is a full-outer join over ≤ 200 skinny rows."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    term_arr = F.array(*[F.lit(t) for t in _RRF_TERMS])
    lex_scored = (
        docs.filter(F.col("doc_id") != 0)
        .select(
            "doc_id",
            F.size(
                F.filter(
                    textops.tokens("text"),
                    lambda t: F.array_contains(term_arr, t),
                )
            ).alias("lex_score"),
        )
        .filter(F.col("lex_score") > 0)
    )
    w_lex = Window.orderBy(F.col("lex_score").desc(), F.col("doc_id"))
    lex = (
        lex_scored.withColumn("lex_rank", F.row_number().over(w_lex))
        .filter(F.col("lex_rank") <= _CAND_K)
        .select("doc_id", "lex_rank")
    )

    qvec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"),
        fixed_norm2(F.col("embedding")).alias("qnorm2"),
    )
    scored = (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qvec))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                fixed_dot(F.col("embedding"), F.col("qvec"))
                / (F.sqrt("qnorm2") * F.sqrt(fixed_norm2(F.col("embedding"))))
            ).alias("cosine"),
        )
    )
    w_vec = Window.orderBy(F.col("cosine").desc(), F.col("doc_id"))
    vec = (
        scored.withColumn("vec_rank", F.row_number().over(w_vec))
        .filter(F.col("vec_rank") <= _CAND_K)
        .select("doc_id", "vec_rank")
    )

    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0))
        ).alias("rrf_score"),
    )
    w_fused = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return fused.withColumn("fused_rank", F.row_number().over(w_fused)).filter(
        F.col("fused_rank") <= _FUSED_K
    )
