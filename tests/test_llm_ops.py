"""Unit tests for the LLM-pipeline operators (dedup/similarity/
multimodal) beyond the oracle-parity coverage."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_energy_data_server_spark.io import load_table
from open_energy_data_server_spark.operators import multimodal
from open_energy_data_server_spark.operators.dedup_text import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)
from open_energy_data_server_spark.operators.similarity import cosine_zip
from tests.conftest import SF_DIR_ORACLE


def test_lsh_recall_of_planted_near_dups(spark):
    """Every planted near-dup (jaccard ≥ 0.95) must appear among the
    MinHash-LSH candidates — the banding is tuned for high-sim pairs."""
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    true_pairs = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(docs, "doc_id", "text", threshold=0.95).collect()
    }
    assert true_pairs, "generator should plant near-duplicates"
    sigs = minhash_signatures(docs, "doc_id", "text")
    candidates = {
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs, rows_per_band=2).collect()
    }
    missed = true_pairs - candidates
    assert not missed, f"LSH missed planted near-dups: {missed}"


def test_cosine_zip_self_similarity(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").limit(20)
    out = emb.select(cosine_zip(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert all(abs(r.c - 1.0) < 1e-9 for r in out)


def test_fake_decode_bytes():
    feats = multimodal.fake_decode_bytes(b"abca")
    assert feats == {
        "n_bytes": 4,
        "sum_bytes": 97 + 98 + 99 + 97,
        "n_distinct_bytes": 3,
        "mean_byte": (97 + 98 + 99 + 97) / 4,
    }


def test_multimodal_resize_and_frame_sample(spark):
    """Resize: nearest-neighbor byte-grid fake, numpy-verified output
    bytes and sizes. Frame sampling: row-expanding batch (one row per
    sampled timestamp), exact frame slices."""
    import numpy as np

    from open_energy_data_server_spark.io import local_df

    # 4x4 gradient image, resize to 2x2 -> rows/cols 0 and 2
    img = bytes(range(16))
    assets = spark.createDataFrame(
        [(1, img, {"mime": "x/gray", "width": 4, "height": 4, "duration_s": 0.0})],
        "asset_id bigint, payload binary, meta struct<mime:string,width:int,height:int,duration_s:double>",
    )
    out = multimodal.resize_images(assets, 2, 2).collect()
    assert len(out) == 1 and out[0]["width"] == 2
    want = np.frombuffer(img, np.uint8).reshape(4, 4)[np.ix_([0, 2], [0, 2])].tobytes()
    assert bytes(out[0]["payload"]) == want

    # "video": 4 frames of 2x1=2 bytes over 4 seconds, sample every 2s
    vid = bytes([10, 11, 20, 21, 30, 31, 40, 41])
    vassets = spark.createDataFrame(
        [(7, vid, {"mime": "x/raw", "width": 2, "height": 1, "duration_s": 4.0})],
        "asset_id bigint, payload binary, meta struct<mime:string,width:int,height:int,duration_s:double>",
    )
    rows = sorted(
        multimodal.sample_video_frames(vassets, 2.0).collect(), key=lambda r: r["t_s"]
    )
    assert [(r["t_s"], bytes(r["payload"])) for r in rows] == [
        (0.0, bytes([10, 11])),
        (2.0, bytes([30, 31])),
    ]

    # injectable codec wins over the fake
    marker = lambda p, w, h, w1, h1: b"X"  # noqa: E731
    out2 = multimodal.resize_images(assets, 2, 2, codec=marker).collect()
    assert bytes(out2[0]["payload"]) == b"X"


def test_winnow_fingerprints_semantics(spark):
    """Hand-checkable winnowing: doc with 6 tokens → 4 ordered 3-gram
    hashes → windows [h1..h4] min plus edge handling for short docs."""
    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.dedup_text import winnow_fingerprints
    from open_energy_data_server_spark.operators.textops import hash60

    docs = local_df(
        spark,
        [(1, "a b c d e f"), (2, "a b c"), (3, "a b")],
        "doc_id bigint, text string",
    )
    out = {r["doc"]: r for r in winnow_fingerprints(docs, "doc_id", "text").collect()}

    import pyspark.sql.functions as F

    grams6 = ["a b c", "b c d", "c d e", "d e f"]
    hs = [
        r[0]
        for r in spark.range(1)
        .select(F.explode(F.array(*[hash60(F.lit(g)) for g in grams6])))
        .collect()
    ]
    # n=4 grams, w=4 → one window covering all four hashes
    assert out[1]["fp"] == [min(hs)]
    assert out[1]["n_fp"] == 1
    # exactly k tokens → a single gram: fingerprint is its own hash
    h_abc = hs[0]
    assert out[2]["fp"] == [h_abc]
    # fewer than k tokens → empty fingerprint set
    assert out[3]["fp"] == [] and out[3]["n_fp"] == 0


def test_winnow_least_form_equals_slice_form(spark):
    """Round-11 pin: the shipped least(element_at...) window minimum
    must equal the original array_min(slice(...)) fold BIT-FOR-BIT —
    adversarial shapes (short docs, all-duplicate grams, empty/NULL,
    n<w) and the real sf0.01 corpus, across w (incl. the w=1 branch
    and w > max gram count)."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.io import local_df
    from open_energy_data_server_spark.operators.dedup_text import (
        _spread,
        hash60,
        tokens,
        winnow_fingerprints,
    )

    def slice_form(df, id_col, text_col, k=3, w=4):
        tok = _spread(df).select(
            F.col(id_col).alias("doc"),
            F.explode(F.array(tokens(text_col))).alias("toks"),
        )
        toks = F.col("toks")
        idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
        grams = F.when(
            F.size(toks) >= k,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(k)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        hashed = tok.select(
            "doc", F.explode(F.array(F.transform(grams, hash60))).alias("hs")
        )
        hs = F.col("hs")
        n = F.size(hs)
        wins = F.transform(
            F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
            lambda j: F.array_min(F.slice(hs, j, F.least(F.lit(w), n))),
        )
        fp = F.when(n > 0, F.array_sort(F.array_distinct(wins))).otherwise(
            F.array().cast("array<bigint>")
        )
        return hashed.select("doc", fp.alias("fp"), F.size(fp).alias("n_fp"))

    adv = local_df(
        spark,
        [
            (1, "a b a b a b"),
            (2, "x y z"),
            (3, "w"),
            (4, None),
            (5, ""),
            (6, "a  b"),
            (7, "  "),
            (8, "q q q q q q q q q q"),
            (9, "one two three four five six seven eight"),
            (10, "t1 t2 t3 t4"),
        ],
        "doc_id bigint, text string",
    )
    for w in (1, 2, 4, 16):
        got = {
            r["doc"]: (list(r["fp"]), r["n_fp"])
            for r in winnow_fingerprints(adv, "doc_id", "text", w=w).collect()
        }
        want = {
            r["doc"]: (list(r["fp"]), r["n_fp"])
            for r in slice_form(adv, "doc_id", "text", w=w).collect()
        }
        assert got == want, f"w={w}"

    real = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    got = {
        r["doc"]: (list(r["fp"]), r["n_fp"])
        for r in winnow_fingerprints(real, "doc_id", "text").collect()
    }
    want = {
        r["doc"]: (list(r["fp"]), r["n_fp"])
        for r in slice_form(real, "doc_id", "text").collect()
    }
    assert got == want


def test_ivf_assign_and_recall(spark):
    """IVF: every vector lands in exactly one of the 16 clusters;
    probing 2/16 lists still recovers most of the exact top-5 (the
    generator's planted neighbors are near, so they share clusters)."""
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
    )

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in emb.filter("vec_id < 16").select("vec_id", "embedding").collect()
    ]
    assigned = ivf_assign(emb, "vec_id", "embedding", cents)
    n = emb.count()
    assert assigned.count() == n
    clusters = {r["cluster"] for r in assigned.collect()}
    assert clusters <= set(range(16))
    # each centroid must be assigned to itself (cosine with itself = 1)
    self_rows = {r["vid"]: r["cluster"] for r in assigned.filter("vid < 16").collect()}
    assert self_rows == {i: i for i in range(16)}

    qids = list(range(10))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, "vec_id", "embedding", qids, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, "vec_id", "embedding", qids, nprobe=2, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    # widening the probe count must not reduce recall
    approx_all = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, "vec_id", "embedding", qids, nprobe=16, k=5).collect()
    }
    assert approx_all == exact


def test_stratified_sample_and_packing(spark):
    """Sampling: rerun-stable, rate-monotone (raising a rate only ADDS
    rows), unlisted strata dropped. Packing: per-bin sums reach the
    budget and overshoot by at most the last row; order-stable."""
    import pyspark.sql.functions as F

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.sampling import (
        pack_by_budget,
        stratified_hash_sample,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    langs = {r[0] for r in docs.select("lang").distinct().collect()}

    s1 = stratified_hash_sample(docs, "doc_id", {"en": 0.2}, "lang")
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    assert {r[0] for r in s1.select("lang").distinct().collect()} <= {"en"}
    ids1b = {r["doc_id"] for r in stratified_hash_sample(
        docs, "doc_id", {"en": 0.2}, "lang").select("doc_id").collect()}
    assert ids1 == ids1b  # rerun-stable
    ids2 = {r["doc_id"] for r in stratified_hash_sample(
        docs, "doc_id", {"en": 0.5}, "lang").select("doc_id").collect()}
    assert ids1 <= ids2  # monotone in the rate

    sized = docs.select("doc_id", "lang", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n"))
    packed = pack_by_budget(sized, "n", budget=1000, stratum_col="lang", order_col="doc_id")
    rows = sorted(
        packed.collect(), key=lambda r: (r["lang"], r["doc_id"])
    )
    sums: dict[tuple, int] = {}
    for r in rows:
        sums[(r["lang"], r["bin"])] = sums.get((r["lang"], r["bin"]), 0) + r["n"]
    for lang in {l for l, _ in sums}:
        bins = sorted(b for l, b in sums if l == lang)
        biggest = max(r["n"] for r in rows if r["lang"] == lang)
        prefix = 0
        for b in bins:
            prefix += sums[(lang, b)]
            if b != bins[-1]:
                # coverage reaches every crossed boundary (offset packing:
                # a bin's own sum may undershoot by its predecessor's
                # overshoot, but the prefix always spans the boundary)
                assert prefix >= (b + 1) * 1000, (lang, b, prefix)
            # overshoot past a boundary is bounded by one row
            assert sums[(lang, b)] < 1000 + biggest, (lang, b)


def test_fixed_k_and_weighted_sampling(spark):
    """Fixed-k: exactly k per stratum, prefix property (k=10 ⊂ k=20).
    Weighted: monotone in the weight, deterministic."""
    import pyspark.sql.functions as F

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.sampling import (
        fixed_size_hash_sample,
        weighted_hash_sample,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    s20 = fixed_size_hash_sample(docs, "doc_id", 20, "lang")
    per = {r["lang"]: r["n"] for r in s20.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n == 20 for n in per.values())
    ids10 = {r["doc_id"] for r in fixed_size_hash_sample(docs, "doc_id", 10, "lang").collect()}
    ids20 = {r["doc_id"] for r in s20.collect()}
    assert ids10 <= ids20 and len(ids10) == len(per) * 10

    lo = {r["doc_id"] for r in weighted_hash_sample(docs, "doc_id", F.lit(0.3)).collect()}
    hi = {r["doc_id"] for r in weighted_hash_sample(docs, "doc_id", F.lit(0.7)).collect()}
    assert lo <= hi and 0 < len(lo) < len(hi) < docs.count()


def test_quadratic_fallbacks_require_opt_in(spark):
    """The unblocked O(n²) pair generators must raise unless the caller
    explicitly opts in — at corpus scale a silent cross join is a
    cluster-killer (round-1 VERDICT guardrail item)."""
    import pytest as _pytest

    from open_energy_data_server_spark.operators.dedup_text import simhash, simhash_pairs
    from open_energy_data_server_spark.operators.similarity import cosine_neardup_pairs

    docs = load_table(spark, SF_DIR_ORACLE, "documents").limit(10)
    sims = simhash(docs, "doc_id", "text")
    with _pytest.raises(ValueError, match="O\\(n²\\)"):
        simhash_pairs(sims)
    n = simhash_pairs(sims, allow_quadratic=True, max_hamming=64).count()
    assert n == 45  # C(10,2) — every pair within 64 bits

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings").limit(5)
    with _pytest.raises(ValueError, match="O\\(n²\\)"):
        cosine_neardup_pairs(emb, "vec_id", "embedding", threshold=-1.0)
    n = cosine_neardup_pairs(
        emb, "vec_id", "embedding", threshold=-1.1, allow_quadratic=True
    ).count()
    assert n == 10  # C(5,2) at threshold below cosine floor


def test_spread_is_gated_on_partition_count(spark):
    """_spread must be a no-op when the source already arrives in at
    least defaultParallelism partitions — document text is never
    shuffled at scale (round-1 VERDICT `_spread` item)."""
    from open_energy_data_server_spark.operators.dedup_text import _spread

    par = spark.sparkContext.defaultParallelism
    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    wide = docs.repartition(par + 4)
    assert _spread(wide) is wide  # identical handle — no added shuffle
    narrow = docs.coalesce(1)
    assert _spread(narrow).rdd.getNumPartitions() == par


def test_strip_boilerplate_lines_semantics(spark):
    """Planted 8-word boilerplate shared by two docs is dropped from
    both; unique lines survive in order; an all-boilerplate doc rebuilds
    to empty text; empty docs are excluded."""
    from open_energy_data_server_spark.operators.textops import strip_boilerplate_lines

    boiler = "b1 b2 b3 b4 b5 b6 b7 b8"
    u1 = "u1 u2 u3 u4 u5 u6 u7 u8"
    u2 = "v1 v2 v3 v4 v5 v6 v7 v8"
    w1 = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {u1} {u2}"),
            (2, f"{w1} {boiler}"),   # boiler at a different position
            (3, boiler),              # all boilerplate → empty rebuild
            (4, ""),                  # excluded entirely
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_lines, r.n_dropped, r.cleaned_text)
        for r in strip_boilerplate_lines(docs, "doc_id", "text").collect()
    }
    assert out[1] == (3, 1, f"{u1} {u2}")
    assert out[2] == (2, 1, w1)
    assert out[3] == (1, 1, "")
    assert 4 not in out


def test_strip_boilerplate_word_index_rebuild(spark):
    """Pins the r10 map-side rebuild internals: cleaned_text is the
    WORD array filtered by line index (word j belongs to line
    floor(j/8)), so a short final line and multiple dropped lines per
    doc must excise exactly — including a dropped line ADJACENT to a
    ragged tail."""
    from open_energy_data_server_spark.operators.textops import (
        strip_boilerplate_lines,
    )

    b1 = "b1 b2 b3 b4 b5 b6 b7 b8"
    b2 = "c1 c2 c3 c4 c5 c6 c7 c8"
    u1 = "u1 u2 u3 u4 u5 u6 u7 u8"  # unique to doc 1
    u3 = "x1 x2 x3 x4 x5 x6 x7 x8"  # unique to doc 3
    docs = spark.createDataFrame(
        [
            (1, f"{b1} {u1} {b2} tail1 tail2"),  # drop lines 0 and 2, keep ragged line 3
            (2, f"{b1} {b2}"),
            (3, f"{u3} {b1} short"),             # drop middle, keep 2-word tail
            (4, f"{b2} {b1}"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.n_lines, r.n_dropped, r.cleaned_text)
        for r in strip_boilerplate_lines(docs, "doc_id", "text").collect()
    }
    assert out[1] == (4, 2, f"{u1} tail1 tail2")
    assert out[2] == (2, 2, "")
    assert out[3] == (3, 1, f"{u3} short")
    assert out[4] == (2, 2, "")


def test_duplicate_spans_merges_overlaps(spark):
    from open_energy_data_server_spark.operators.dedup_text import duplicate_spans

    rep = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, rep + " filler1 one two three"),
            (2, "pre1 pre2 " + rep + " tail9"),
            (3, "unrelated words only here nothing repeats at all today now"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["n_windows"])
        for r in duplicate_spans(docs, "doc_id", "text", window=8).collect()
    }
    # the shared 10-token run has 3 duplicated 8-token windows,
    # merged into ONE maximal span per doc at the right offsets
    assert out[1] == (0, 9, 3)
    assert out[2] == (2, 11, 3)
    assert 3 not in out


def test_duplicate_spans_reports_disjoint_islands(spark):
    from open_energy_data_server_spark.operators.dedup_text import duplicate_spans

    repa = "a1 a2 a3 a4 a5 a6 a7 a8"
    repb = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [
            (1, repa + " gapx gapy gapz " + repb),
            (2, repa + " other words entirely " + repb),
        ],
        "doc_id bigint, text string",
    )
    spans = duplicate_spans(docs, "doc_id", "text", window=8).collect()
    per_doc = {}
    for r in spans:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    # each doc: two disjoint 8-token islands, not one merged span
    assert sorted(per_doc[1]) == [(0, 7), (11, 18)]
    assert sorted(per_doc[2]) == [(0, 7), (11, 18)]


def test_mixture_sample_budget_and_nesting(spark):
    from open_energy_data_server_spark.operators.sampling import mixture_sample

    rows = [(i, "a" if i % 2 == 0 else "b", 10) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, n_tokens bigint")

    small = mixture_sample(df, "doc_id", "lang", "n_tokens", {"a": 50}).collect()
    # budget 50 at 10 tokens/doc -> exactly 5 docs, stratum b excluded
    assert len(small) == 5 and all(r["lang"] == "a" for r in small)
    assert all(r["start_offset"] < 50 for r in small)

    # nesting: a larger budget strictly extends the smaller selection
    big = mixture_sample(
        df, "doc_id", "lang", "n_tokens", {"a": 100, "b": 30}
    ).collect()
    picked_small = {r["doc_id"] for r in small}
    picked_big_a = {r["doc_id"] for r in big if r["lang"] == "a"}
    assert picked_small <= picked_big_a and len(picked_big_a) == 10
    assert sum(1 for r in big if r["lang"] == "b") == 3


def test_mixture_sample_overshoot_bounded_by_last_doc(spark):
    from open_energy_data_server_spark.operators.sampling import mixture_sample

    rows = [(1, "x", 7), (2, "x", 9), (3, "x", 11), (4, "x", 13)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, n_tokens bigint")
    out = mixture_sample(df, "doc_id", "lang", "n_tokens", {"x": 20}).collect()
    total = sum(r["n_tokens"] for r in out)
    last = max(out, key=lambda r: r["start_offset"])
    # every selected doc STARTS under budget; total exceeds it by at
    # most the last doc (offset-partitioned convention)
    assert all(r["start_offset"] < 20 for r in out)
    assert total - last["n_tokens"] < 20 <= total + last["n_tokens"]


def test_remove_duplicate_spans_excises_and_rebuilds(spark):
    from open_energy_data_server_spark.operators.dedup_text import (
        remove_duplicate_spans,
    )

    rep = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, rep + " unique1 unique2"),
            (2, "pre " + rep),
            (3, "totally different words here nothing repeated at all today"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, "doc_id", "text").collect()}
    assert out[1]["clean_text"] == "unique1 unique2"
    assert out[1]["n_removed"] == 8 and out[1]["n_tokens"] == 10
    assert out[2]["clean_text"] == "pre"
    # untouched doc passes through verbatim (lowercased tokenization)
    assert out[3]["n_removed"] == 0
    assert out[3]["clean_text"] == "totally different words here nothing repeated at all today"


def test_remove_duplicate_spans_multi_span_null_and_full_removal(spark):
    """Pins the array-rebuild internals (r10): multiple disjoint spans
    per doc excise independently via the per-doc span list, null-text
    docs are excluded (split(NULL) is NULL — the oracle's unnest of a
    NULL range emits nothing), and a fully-covered doc rebuilds to the
    empty string, not NULL."""
    from open_energy_data_server_spark.operators.dedup_text import (
        remove_duplicate_spans,
    )

    r1 = "a1 a2 a3 a4 a5 a6 a7 a8"
    r2 = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [
            (1, r1 + " mid " + r2),       # two disjoint spans, one doc
            (2, r1 + " tailA tailB"),
            (3, "lead " + r2),
            (4, r1),                       # fully covered -> ""
            (5, None),                     # excluded entirely
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, "doc_id", "text").collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert out[1]["clean_text"] == "mid"
    assert out[1]["n_removed"] == 16 and out[1]["n_tokens"] == 17
    assert out[2]["clean_text"] == "taila tailb"  # lowercased tokenization
    assert out[3]["clean_text"] == "lead"
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 8


def test_dedup_purge_token_accounting_skips_null_text(spark):
    """Pins the cross-engine null contract the purge accounting relies
    on: Spark 4's size(split(NULL)) is NULL (not legacy -1), so SUM
    skips null-text docs exactly like DuckDB's SUM(len(NULL))."""
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.operators.textops import tokens

    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id bigint, text string"
    )
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens("text"))).alias("s"),
    ).collect()[0]
    assert (row["n"], row["s"]) == (2, 3)


def test_shuffle_shards_shape_and_determinism(spark):
    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.sampling import shuffle_shards
    from tests.conftest import SF_DIR_ORACLE

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id")
    n = docs.count()
    out = shuffle_shards(docs, "doc_id", n_shards=8)
    rows = out.collect()
    assert len(rows) == n  # total function: every row sharded
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # shards are hash-balanced, not skewed (within 3x of each other)
    sizes = sorted(len(p) for p in by_shard.values())
    assert sizes[-1] <= 3 * sizes[0]
    # rerun-stable (deterministic hash, no rand())
    again = {(r["doc_id"], r["shard"], r["pos"])
             for r in shuffle_shards(docs, "doc_id", n_shards=8).collect()}
    assert again == {(r["doc_id"], r["shard"], r["pos"]) for r in rows}
    # exactly one exchange: the per-shard position window (count the
    # AQE final plan only — toString appends the initial plan too)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1


def test_cms_never_underestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.sketch import (
        cms_counters,
        cms_estimate,
    )
    from open_energy_data_server_spark.operators.textops import tokens
    from tests.conftest import SF_DIR_ORACLE

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("tok"))
    counters = cms_counters(toks, "tok", d=4, w=64)  # small w: collisions
    assert counters.count() <= 4 * 64
    truth = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_count"))
    est = cms_estimate(truth.select("tok"), counters, "tok", d=4, w=64)
    joined = truth.join(est, "tok")
    # CMS invariant: min-of-counters is an OVERestimate for every key
    assert joined.filter(F.col("cms_count") < F.col("true_count")).count() == 0
    # mergeability: counters(stream twice) == 2 x counters(stream)
    doubled = cms_counters(toks.unionAll(toks), "tok", d=4, w=64)
    diff = (
        counters.withColumnRenamed("cnt", "c1")
        .join(doubled, ["j", "bucket"])
        .filter(F.col("cnt") != 2 * F.col("c1"))
    )
    assert diff.count() == 0


def test_shuffle_shards_zero_raises(spark):
    import pytest

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.sampling import shuffle_shards
    from tests.conftest import SF_DIR_ORACLE

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(docs, "doc_id", n_shards=0)


def test_hash_split_stable_and_complete(spark):
    import pytest
    from pyspark.sql import functions as F

    from open_energy_data_server_spark.io import load_table
    from open_energy_data_server_spark.operators.sampling import hash_split
    from tests.conftest import SF_DIR_ORACLE

    docs = load_table(spark, SF_DIR_ORACLE, "documents").select("doc_id")
    out = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == docs.count()  # total: every row labeled
    assert set(rows.values()) == {"train", "val", "test"}
    # roughly proportional (hash-uniform; generous bounds for n=500)
    n = len(rows)
    frac_train = sum(1 for v in rows.values() if v == "train") / n
    assert 0.7 < frac_train < 0.9
    # rerun-stable
    again = {r["doc_id"]: r["split"] for r in hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert again == rows
    # zero-shuffle projection
    plan = out._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan ==")[0]
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"train": 0.5})


def test_chunk_tokens_tail_coverage_and_edges(spark):
    """Every token lands in >=1 chunk; starts are exactly
    0, stride, ... < n; short docs yield a single short chunk."""
    from open_energy_data_server_spark.operators.textops import chunk_tokens

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(20))),  # 20 toks: starts 0,8,16
            (2, "one two"),  # short doc -> one chunk of 2
            (3, "solo"),  # single token
            (4, ""),  # empty text -> split('') == [''] -> one 1-token chunk
        ],
        "doc_id bigint, text string",
    )
    out = chunk_tokens(df, "doc_id", "text", window=16, stride=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [c["start_tok"] for c in sorted(by_doc[1], key=lambda c: c["chunk_id"])] == [0, 8, 16]
    # tail chunk is short but covers tokens 16..19
    tail = max(by_doc[1], key=lambda c: c["start_tok"])
    assert tail["n_tokens"] == 4 and tail["chunk_text"].endswith("t19")
    # full coverage: union of [start, start+n) == [0, 20)
    covered = set()
    for c in by_doc[1]:
        covered |= set(range(c["start_tok"], c["start_tok"] + c["n_tokens"]))
    assert covered == set(range(20))
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 2
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == "solo"
    assert len(by_doc[4]) == 1  # degenerate doc still emits one chunk


def test_fold_accents_folds_everything_in_map_and_is_idempotent(spark):
    from open_energy_data_server_spark.operators.textops import FOLD_MAP, fold_accents

    src = "".join(a for a, _ in FOLD_MAP) + " Müßige Straße déjà"
    df = spark.createDataFrame([(src,)], "s string")
    once = df.select(fold_accents("s").alias("f")).collect()[0]["f"]
    twice = (
        spark.createDataFrame([(once,)], "s string")
        .select(fold_accents("s").alias("f"))
        .collect()[0]["f"]
    )
    assert once == twice  # idempotent: replacements introduce no accents
    assert not any(a in once for a, _ in FOLD_MAP)
    assert "Muessige Strasse deja" in once


def test_chunk_tokens_null_text_yields_no_chunks(spark):
    from open_energy_data_server_spark.operators.textops import chunk_tokens

    df = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id bigint, text string"
    )
    out = chunk_tokens(df, "doc_id", "text").collect()
    assert {r["doc_id"] for r in out} == {1}


def test_repetition_signals_hand_computed(spark):
    import pytest

    from open_energy_data_server_spark.operators.textops import (
        max_equal_run,
        repetition_signals,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 6 words, 2 distinct; "a b" x3 of 5 bigrams
            (2, "x y z"),            # all distinct
            (3, "w"),                # single word: no bigrams/trigrams
            (4, "q q q q"),          # total repetition
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in repetition_signals(docs, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1.n_words == 6
    assert r1.dup_word_frac == pytest.approx(1 - 2 / 6)
    assert r1.top_bigram_share == pytest.approx(3 / 5)  # "a b" thrice
    assert r1.dup_trigram_frac == pytest.approx(1 - 2 / 4)  # aba/bab alternate
    assert out[2].dup_word_frac == 0.0 and out[2].top_bigram_share == pytest.approx(1 / 2)
    assert out[3].top_bigram_share is None and out[3].dup_trigram_frac is None
    assert out[4].dup_word_frac == pytest.approx(0.75)
    assert out[4].top_bigram_share == 1.0

    # the fold primitive on its own
    got = spark.range(1).select(
        max_equal_run(F.array(*[F.lit(v) for v in ["a", "a", "b", "c", "c", "c"]])).alias("m")
    ).collect()[0]["m"]
    assert got == 3
    empty = spark.range(1).select(
        max_equal_run(F.array_remove(F.array(F.lit("x")), "x")).alias("m")
    ).collect()[0]["m"]
    assert empty == 0
