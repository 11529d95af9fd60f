"""Plan-hygiene gate: mechanical enforcement of the scale rules the
engine claims (SCALE.md). Every conformance query's *executed* plan is
inspected — not its results — so regressions that silently drop a
query out of whole-stage codegen or into a Python worker fail CI.

Rules:
- NO row-at-a-time Python (`BatchEvalPython`) anywhere, ever.
- Arrow-batched Python (`MapInPandas` etc.) only where documented:
  the multimodal decode stub (the codec is the stub; the batch
  plumbing is the product).
- Every parquet scan must prune columns: reading a full-width
  lineitem (16 cols) for a 2-column aggregate means pushdown broke.
"""

from __future__ import annotations

import re


# Arrow-batched Python is allowed ONLY here:
# - q_multimodal_decode: documented injectable codec, batch plumbing is
#   the product
# - q_interpolate_cubic: per-series not-a-knot spline — a global
#   tridiagonal solve per group, genuinely non-relational
# - round-10 exact vector kernels (operators/vecexact.py): the fixed-
#   point cosine / L2 arithmetic is CodegenFallback as an expression
#   tree (interpreted per array element); the Arrow kernels compute
#   the bit-identical IEEE-754 sequence vectorized (guide §4.2) and
#   are pinned against the relational forms by tests/test_vecexact.py
# - round-10 exact TEXT kernel (operators/textkernel.py): the token
#   n-gram folds are CodegenFallback as expressions (interpreted per
#   array element); the Arrow kernel computes the identical integer
#   counts + single-IEEE-division results vectorized (guide §4.2),
#   pinned bit-for-bit by tests/test_textkernel.py
PANDAS_ALLOWED = {
    "q_multimodal_decode",
    "q_interpolate_cubic",
    "q_semdedup_pairs",
    "q_dedup_embedding_cosine",
    "q_pq_encode",
    "q_pq_adc_topk",
    "q_kmeans_refine",
    "q_repetition_signals",
    "q_text_stats",
    "q_lang_id",
}

ROW_PYTHON = ("BatchEvalPython",)
BATCH_PYTHON = (
    "MapInPandas",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "PythonMapInArrow",
    "FlatMapGroupsInPandasWithState",
)


def _plans(spark):
    import __spark_entry__ as e

    # plan *strings* truncate per-field metadata at
    # spark.sql.maxMetadataStringLength (default 100): a 6-column
    # lineitem ReadSchema renders as "struct<l_orderkey:bigint,...doub"
    # with NO closing '>', and a regex over it silently spills into the
    # next scan's schema. Raise the limit so the text we parse is the
    # whole truth.
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        for name, fn in sorted(e.queries().items()):
            df = fn(spark, "/root/testdata/sf0.001")
            yield name, df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)


def test_no_python_in_query_plans(spark):
    offenders = []
    for name, plan in _plans(spark):
        if any(m in plan for m in ROW_PYTHON):
            offenders.append((name, "row-at-a-time Python"))
        elif name not in PANDAS_ALLOWED and any(m in plan for m in BATCH_PYTHON):
            offenders.append((name, "undocumented Python batch op"))
    assert not offenders, offenders


# Nested-loop joins allowed ONLY where the broadcast side is bounded
# by construction (documented in each query's docstring):
#   - brute-force ANN: |Q| query rows broadcast (non-equi vid != qid)
#   - sampled cosine near-dup: 1/17 sample, block_col bounds it at scale
#   - watermark filter: 1-row agg(max) scalar broadcast (W4 pattern)
#   - ranking queries: 1-row corpus-stat broadcasts (N docs, Σdl,
#     Σcnt) attached keylessly — the scalar-subquery shape
NLJ_ALLOWED = {
    "q_ann_bruteforce_topk",
    "q_dedup_embedding_cosine",
    "q_incremental_since_watermark",
    "q_tfidf_topk",
    "q_bm25_search",
    "q_familiarity_buckets",
    # 1-row query-vector broadcast attached keylessly to the corpus
    # scan (the scalar-subquery shape; see q_rrf_hybrid_search doc)
    "q_rrf_hybrid_search",
    # scaffold grid: |distinct series| × |generated hours| cross join —
    # bounded metadata by construction (round8b docstring)
    "q_autocorr_lag",
    # three 1-row count aggregates combined into the single output row
    "q_triangle_count",
    # 1-row global-average broadcast gating the anti-join (the Q22
    # uncorrelated scalar-subquery shape; round9b docstring) — the
    # nested-loop side is a single row by construction
    "q_idle_rich_customers",
    # 1-row HAVING-scalar broadcast (the Q11 uncorrelated scalar cut;
    # round10.py docstring) — the nested-loop side is a single row by
    # construction, same shape as q_idle_rich_customers above
    "q_important_volume_parts",
}


def test_no_unbounded_nested_loop_joins(spark):
    offenders = []
    for name, plan in _plans(spark):
        if name in NLJ_ALLOWED:
            continue
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            offenders.append(name)
    assert not offenders, f"unbounded nested-loop joins: {offenders}"


def test_lineitem_scans_prune_columns(spark):
    """Any query scanning lineitem must read < its full 11 columns —
    a full-width fact scan for a narrower projection means column
    pruning broke. The regex is newline-bounded so a (hypothetically)
    truncated ReadSchema can't spill into the next scan's schema."""
    wide = []
    for name, plan in _plans(spark):
        for m in re.finditer(r"ReadSchema: struct<([^>\n]*)>", plan):
            scan_window = plan[max(0, m.start() - 400) : m.end()]
            if "lineitem" not in scan_window:
                continue
            ncols = len([c for c in m.group(1).split(",") if ":" in c])
            if ncols >= 11:
                wide.append((name, ncols))
    assert not wide, f"full-width lineitem scans: {wide}"


def test_single_scan_for_rewritten_shared_subtrees(spark):
    """The three round-5 queries whose first drafts re-ran a shared
    subtree per unionAll/join branch must stay single-scan (struct-
    array explode / stack-on-1-row / conditional-agg-slice idioms)."""
    from open_energy_data_server_spark.queries import QUERIES

    for name in (
        "q_concurrency_sweep",
        "q_missing_value_profile",
        "q_active_users",
    ):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_scans = plan.count("Scan parquet")
        assert n_scans == 1, f"{name}: {n_scans} parquet scans (want 1)"


def test_map_only_queries_have_no_exchange(spark):
    """Queries whose whole point is the zero-shuffle shape (array
    n-grams + fold instead of explode+group) must stay exchange-free:
    a regression to explode would silently reintroduce a corpus-wide
    shuffle."""
    from open_energy_data_server_spark.queries import QUERIES

    for name in ("q_repetition_signals", "q_chunk_documents"):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} plan gained a shuffle"
        assert plan.count("Scan parquet") == 1, f"{name}: not single-scan"
