"""Near-duplicate detection for document corpora — the LLM-pipeline
dedup suite (BASELINE.json north star): exact, MinHash+LSH, SimHash,
n-gram Jaccard.

Everything is expressed relationally (explode → join → agg) with
md5-derived 60-bit hashes, so (a) the whole pipeline is JVM-built-ins
at scan speed — no Python UDFs — and (b) DuckDB can replay it exactly
for the oracle gate.

Scale design (the point of each shape):
- Exact dedup: hash-groupBy on a 16-byte fingerprint — one shuffle of
  (fingerprint, id), never of the text.
- Jaccard pairs: *inverted shingle index* self-join, not a cross
  join — candidate pairs are generated only where a shingle collides;
  hot shingles (stopword runs) are the skew risk → drop shingles with
  document frequency > df_cap before pairing (standard posting-list
  pruning; changes recall only for near-universal shingles).
- MinHash: k hash functions simulated as (aᵢ·h + bᵢ) mod P over one
  base hash (Broder's scheme), folded per row over the shingle-hash
  array — a pure projection, zero shuffles.
- LSH: band signature = concat of r adjacent minhashes; candidates
  join on (band, signature) — |docs|·(k/r) rows shuffled.
- SimHash: packed-lane per-bit counts folded per row over the
  token-hash array — a pure projection, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.textops import (
    fingerprint_normalized,
    hash60,
    shingles,
    tokens,
)

MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)


def minhash_params(k: int = 16) -> list[tuple[int, int, int]]:
    """Deterministic (i, aᵢ, bᵢ) rows — shared with the SQL oracle."""
    return [(i, 1 + 2 * i, 7 + 13 * i) for i in range(k)]


def _spread(df: DataFrame) -> DataFrame:
    """Spread a small-file source across the cluster before CPU-heavy
    per-row work — a compact parquet lands in one task otherwise and
    the explode/md5 stage runs single-threaded.

    GATED: only repartitions when the source arrives in fewer
    partitions than the cluster has cores. A 100 TB corpus already
    lands in thousands of splits (``spark.sql.files.maxPartitionBytes``
    sizes them), so at scale this is a no-op and document text is never
    shuffled — the shuffle only happens for the pathological
    one-small-file layout, where its cost is trivially small."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)


def doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) exploded distinct shingle set per document.

    The token array is materialized through a generator barrier
    (``explode(array(tokens))``) before the shingle transform:
    without it Catalyst collapses the projections and every
    ``element_at`` re-evaluates ``split`` — O(tokens²) CPU per
    document (measured 4× slowdown at 5k docs)."""
    tok = _spread(df).select(
        F.col(id_col).alias("doc"), F.explode(F.array(tokens(text_col))).alias("toks")
    )
    return tok.select("doc", F.explode(shingles(F.col("toks"), n)).alias("s"))


def doc_shingle_hash_arrays(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(doc, hs: array<bigint>) — each document's distinct shingle set
    hashed to 60-bit ints, kept as ONE per-row array (no explode).

    This is the scan-shaped representation the per-row dedup forms
    build on: tokenize → shingle → hash is a pure projection, so a
    100 TB corpus computes it at scan speed with zero shuffles and the
    consumers decide whether they ever need to explode. Generator
    barriers protect both the token array (against the O(tokens²)
    projection collapse, as in doc_shingles) and the hash array itself
    (consumers reference it several times — k affine maps, size +
    explode — and Catalyst would otherwise inline the tokenize →
    shingle → md5 pipeline into every reference)."""
    tok = _spread(df).select(
        F.col(id_col).alias("doc"), F.explode(F.array(tokens(text_col))).alias("toks")
    )
    hashed = tok.select(
        "doc",
        F.explode(F.array(F.transform(shingles(F.col("toks"), n), hash60))).alias("hs"),
    )
    return hashed


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: normalized-md5 fingerprint + per-fingerprint count
    and keeper (min id). dup_count == 1 → unique document."""
    fp = df.select(F.col(id_col).alias("doc"), fingerprint_normalized(text_col).alias("fp"))
    w = Window.partitionBy("fp")
    return fp.select(
        "doc",
        "fp",
        F.count(F.lit(1)).over(w).alias("dup_count"),
        F.min("doc").over(w).alias("keeper"),
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs via the inverted shingle index.

    Returns (doc_a, doc_b, inter, size_a, size_b, jaccard ≥ threshold).
    """
    # join on the 60-bit shingle hash, not the string: shuffle rows are
    # (doc, bigint) instead of (doc, ~20-char text) and the equi-join
    # compares longs. Collision risk 2^-60 per pair — the same hash
    # family the minhash path already relies on (oracle replays it).
    # The set size rides along on every posting row (one bigint), so
    # the jaccard denominator needs NO per-doc size aggregation and no
    # size joins — the whole query is scan → one equi-join → one pair
    # aggregation.
    sh = doc_shingle_hash_arrays(df, id_col, text_col, n).select(
        "doc", F.size("hs").cast("bigint").alias("sz"), F.explode("hs").alias("h")
    )
    if df_cap is not None:
        hot = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") > df_cap)
        sh = sh.join(hot, "h", "left_anti")
    # the posting stream feeds both join sides — persist it so the
    # text pipeline runs once (at cluster scale: MEMORY_AND_DISK,
    # ~24 bytes/shingle; Spark LRU evicts)
    from pyspark import StorageLevel

    from open_energy_data_server_spark.operators._cache import register_persisted

    sh = register_persisted(sh.persist(StorageLevel.MEMORY_AND_DISK))
    a = sh.select(F.col("doc").alias("doc_a"), F.col("sz").alias("size_a"), "h")
    b = sh.select(F.col("doc").alias("doc_b"), F.col("sz").alias("size_b"), "h")
    inter = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "size_a", "size_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")
    )


def minhash_wide(df: DataFrame, id_col: str, text_col: str, k: int = 16) -> DataFrame:
    """(doc, mh0..mh{k-1}) — all k minhashes as a pure per-row
    projection: mhᵢ = array_min over the document's shingle-hash array
    under the iᵗʰ affine map. No explode, no aggregation, ZERO
    shuffles — a 100 TB corpus minhashes at scan speed, embarrassingly
    parallel over file splits. (The previous shape — explode + k
    min-aggregates — was already one shuffle of k-column partials;
    this removes even that.)

    Documents with no shingles (< n tokens) are dropped, matching the
    exploded/grouped form where they contribute no rows."""
    hs = doc_shingle_hash_arrays(df, id_col, text_col).filter(F.size("hs") > 0)
    base = hs.select("doc", F.transform("hs", lambda h: h % MINHASH_P).alias("hp"))
    cols = [
        F.array_min(
            F.transform("hp", lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P)
        ).alias(f"mh{i}")
        for i, a, b in minhash_params(k)
    ]
    return base.select("doc", *cols)


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, k: int = 16) -> DataFrame:
    """(doc, i, mh) long form — melt of minhash_wide (flatMap, no
    extra shuffle)."""
    wide = minhash_wide(df, id_col, text_col, k)
    pairs = ", ".join(f"{i}, mh{i}" for i in range(k))
    return wide.selectExpr("doc", f"stack({k}, {pairs}) AS (i, mh)").select(
        "doc", F.col("i").cast("int").alias("i"), "mh"
    )


def lsh_candidate_pairs_wide(
    wide: DataFrame, k: int = 16, rows_per_band: int = 2, min_shared_bands: int = 1
) -> DataFrame:
    """(doc_a, doc_b, n_shared_bands) from minhash_wide output.

    Band signatures are built as string expressions straight from the
    wide columns (sort_array of per-row 'i:mh' strings — identical
    format to the long-form/oracle path), stacked to (doc, band, sig)
    rows — a flatMap — and self-joined on (band, sig). Total shuffle:
    |docs|·(k/rows_per_band) short strings."""
    n_bands = k // rows_per_band
    banded_legs = []
    for b in range(n_bands):
        members = [
            F.concat_ws(":", F.lit(i), F.col(f"mh{i}"))
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        banded_legs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(",", F.sort_array(F.array(*members))).alias("sig"),
            )
        )
    banded = wide.select(
        "doc", F.explode(F.array(*banded_legs)).alias("bs")
    ).select("doc", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    a = banded.select(F.col("doc").alias("doc_a"), "band", "sig")
    b_ = banded.select(F.col("doc").alias("doc_b"), "band", "sig")
    return (
        a.join(b_, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= min_shared_bands)
    )


def lsh_candidate_pairs(
    signatures: DataFrame, rows_per_band: int = 2, min_shared_bands: int = 1
) -> DataFrame:
    """(doc_a, doc_b, n_shared_bands) — documents colliding in ≥1 LSH
    band. signatures = output of minhash_signatures (long form)."""
    banded = (
        signatures.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("doc", "band")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list(F.concat_ws(":", "i", "mh")))).alias(
                "sig"
            )
        )
    )
    a = banded.select(F.col("doc").alias("doc_a"), "band", "sig")
    b = banded.select(F.col("doc").alias("doc_b"), "band", "sig")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
        .filter(F.col("n_shared_bands") >= min_shared_bands)
    )


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 60, lane_counters: int = 4
) -> DataFrame:
    """(doc, simhash) — 60-bit SimHash over token hashes, computed
    per row with ZERO shuffles.

    The token-hash array never leaves its row: per-bit set-counts are
    ``aggregate`` folds over the array, SIMD-style packed
    ``lane_counters`` to a 64-bit sum lane (16-bit sub-counters at the
    default 4, so ``bits/lane_counters`` folds instead of ``bits``);
    bit j of the result is set when more token hashes have bit j set
    than not (2·count > n). No explode, no hash aggregate, no
    exchange — a 100 TB corpus simhashes at scan speed (measured 1.7×
    over the explode + packed-lane hash-agg form at sf0.1, which was
    itself 3× over the naive 60-sum aggregate).

    The 16-bit sub-counter bounds documents at 65 535 tokens; for
    monster documents pass ``lane_counters=2`` (32-bit sub-counters,
    2^32 tokens). Values are bit-identical either way — the DuckDB
    oracle replays the plain 60-sum formulation.
    """
    tok = _spread(df).select(
        F.col(id_col).alias("doc"), F.explode(F.array(tokens(text_col))).alias("toks")
    )
    # second barrier: the md5 fold below references the hash array
    # once per lane — without materialization Catalyst would inline
    # (and re-run) the md5 transform into every fold
    th = tok.select(
        "doc", F.explode(F.array(F.transform(F.col("toks"), hash60))).alias("th")
    )
    lane_width = 64 // lane_counters
    n_lanes = (bits + lane_counters - 1) // lane_counters

    def _lane_fold(g: int):
        def f(acc, h):
            expr = None
            for k in range(lane_counters):
                j = g + n_lanes * k
                if j >= bits:
                    break
                term = F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("bigint") * F.lit(
                    1 << (lane_width * k)
                ).cast("bigint")
                expr = term if expr is None else expr + term
            return acc + expr

        return f

    lanes = [
        F.aggregate("th", F.lit(0).cast("bigint"), _lane_fold(g)).alias(f"L{g}")
        for g in range(n_lanes)
    ]
    agg = th.select("doc", F.size("th").alias("n"), *lanes)
    sub_mask = (1 << lane_width) - 1
    sim = F.lit(0).cast("bigint")
    for g in range(n_lanes):
        for k in range(lane_counters):
            j = g + n_lanes * k
            if j >= bits:
                break
            cnt = F.shiftright(F.col(f"L{g}"), lane_width * k).bitwiseAND(F.lit(sub_mask))
            sim = sim + F.when(cnt * 2 > F.col("n"), F.lit(1 << j).cast("bigint")).otherwise(
                F.lit(0)
            )
    return agg.select("doc", sim.alias("simhash"))


def simhash_pairs_banded(
    sims: DataFrame, max_hamming: int = 3, bits: int = 60
) -> DataFrame:
    """EXACT hamming-distance self-join (dist ≤ max_hamming) without
    the O(n²) cross join — Manku/Jain/Sarma's pigeonhole banding
    (WWW'07 'Detecting Near-Duplicates for Web Crawling').

    Split the ``bits``-wide simhash into ``max_hamming + 1`` bands:
    any pair within the distance budget is bit-identical in ≥ 1 band
    (pigeonhole), so candidates come from an equi-join on
    (band_id, band_value) — n·(max_hamming+1) shuffled rows instead of
    n² pairs — then the true bit_count filter keeps exactness. Recall
    is 100% by construction; band width ``bits/(h+1)`` (15 at the
    defaults) keeps random collisions ~n²/2^width, i.e. vanishing
    until n ≈ 32 k docs *per band value*; re-band wider for larger
    corpora."""
    n_bands = max_hamming + 1
    width = bits // n_bands
    legs = []
    for g in range(n_bands):
        w = width if g < n_bands - 1 else bits - width * (n_bands - 1)
        legs.append(
            F.struct(
                F.lit(g).alias("band"),
                F.shiftright("simhash", g * width).bitwiseAND(F.lit((1 << w) - 1)).alias("bv"),
            )
        )
    banded = sims.select("doc", "simhash", F.explode(F.array(*legs)).alias("b")).select(
        "doc", "simhash", F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    a = banded.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "bv"
    )
    b = banded.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "bv"
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()  # a pair can collide in several bands
    )


def simhash_pairs(
    sims: DataFrame,
    by: DataFrame | None = None,
    max_hamming: int = 8,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Without a blocking key this is O(n²)/2 — callers at scale pass a
    blocking DataFrame (doc, block) to bound the candidate set (or use
    ``simhash_pairs_banded`` for exact-recall pigeonhole banding). The
    unblocked cross join must be opted into with
    ``allow_quadratic=True`` — it is only sane on sampled/small sets."""
    if by is not None:
        sims = sims.join(by, "doc")
        a = sims.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"), "block")
        b = sims.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"), "block")
        pairs = a.join(b, "block").filter(F.col("doc_a") < F.col("doc_b"))
    else:
        if not allow_quadratic:
            raise ValueError(
                "simhash_pairs without a blocking key is O(n²); pass "
                "allow_quadratic=True for sampled/small sets, a `by` "
                "blocking DataFrame, or use simhash_pairs_banded"
            )
        a = sims.select(F.col("doc").alias("doc_a"), F.col("simhash").alias("sh_a"))
        b = sims.select(F.col("doc").alias("doc_b"), F.col("simhash").alias("sh_b"))
        pairs = a.crossJoin(b).filter(F.col("doc_a") < F.col("doc_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """(doc, fp: array<bigint>, n_fp) — MOSS-style winnowed document
    fingerprints (Schleimer et al., SIGMOD'03): the rolling sequence of
    word-k-gram hashes, sliced into windows of w consecutive hashes,
    keeping each window's minimum; the sorted distinct minima are the
    document's fingerprint set.

    Pure per-row projection (sequence/transform/slice/array_min folds
    over the ORDERED gram-hash array — position matters here, unlike
    the distinct shingle set): zero shuffles, a 100 TB corpus
    fingerprints at scan speed. A doc with fewer than w grams yields
    one whole-array window; fewer than k tokens yields an empty set.
    """
    tok = _spread(df).select(
        F.col(id_col).alias("doc"), F.explode(F.array(tokens(text_col))).alias("toks")
    )
    toks = F.col("toks")
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # generator barrier: the window folds below reference the hash
    # array many times (size + one slice per window) — without it each
    # reference re-runs tokenize → gram → md5
    hashed = tok.select("doc", F.explode(F.array(F.transform(grams, hash60))).alias("hs"))
    hs = F.col("hs")
    n = F.size(hs)
    # window minimum as least() over w direct element_at lookups, not
    # array_min(slice(...)): the slice form copied a w-element array
    # per window (one allocation + an interpreted array_min per window
    # inside the transform fold); least() is a flat expression over w
    # reads. element_at past the array end yields NULL (ANSI off) and
    # least() skips NULLs, which reproduces the n<w whole-array window
    # exactly (j=1, min over the n real elements). Hash values are
    # never NULL (md5 of non-null gram strings), so least ≡ array_min
    # on every in-range window. Bit-identical by construction — pinned
    # vs the slice form on adversarial shapes + sf0.01 by
    # tests/test_llm_ops.py::test_winnow_least_form_equals_slice_form;
    # measured 0.202 → 0.097 s solo at sf0.1 (round-11, guide §4.1).
    wins = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (w - 1), F.lit(1))),
        lambda j: (
            F.element_at(hs, j)  # least() needs >=2 args
            if w == 1
            else F.least(*[F.element_at(hs, j + i) for i in range(w)])
        ),
    )
    fp = F.when(n > 0, F.array_sort(F.array_distinct(wins))).otherwise(
        F.array().cast("array<bigint>")
    )
    return hashed.select("doc", fp.alias("fp"), F.size(fp).alias("n_fp"))


def winnow_fingerprint_strings(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """``winnow_fingerprints`` with the set serialized as a canonical
    comma-joined string — the cross-engine exchange form (array cell
    formatting differs between result transports; a joined string
    hashes identically everywhere)."""
    out = winnow_fingerprints(df, id_col, text_col, k=k, w=w)
    return out.select(
        "doc",
        F.array_join("fp", ",").alias("fp"),
        F.col("n_fp").cast("bigint").alias("n_fp"),
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    n: int = 3,
    min_frac: float = 0.2,
) -> DataFrame:
    """Benchmark decontamination: flag training documents whose word
    n-gram sets overlap an evaluation/benchmark corpus above
    ``min_frac`` — the standard pre-training hygiene pass (n-gram
    collision decontamination, as published for GPT-3/PaLM-style
    pipelines; the reference has no analog — this is part of the
    engine's training-data suite).

    → (doc, n_grams, n_contaminated, frac) for flagged docs.

    Scale shape: the benchmark side is small by definition (eval sets),
    so its distinct gram-hash set BROADCASTS; the corpus side stays
    scan-shaped — tokenize → shingle → hash is a per-row projection,
    the broadcast semi-ish join filters grams map-side, and the only
    shuffle is the final per-doc count on (doc) — a 100 TB corpus
    decontaminates in one pass with no text ever entering an exchange.
    The per-doc gram-set size rides along on every posting row, so no
    second aggregation or size join is needed (same trick as
    jaccard_pairs)."""
    corpus = doc_shingle_hash_arrays(docs, id_col, text_col, n).select(
        "doc", F.size("hs").cast("bigint").alias("sz"), F.explode("hs").alias("h")
    )
    bench_grams = (
        doc_shingle_hash_arrays(benchmark, bench_id_col, bench_text_col, n)
        .select(F.explode("hs").alias("h"))
        .distinct()
    )
    hits = corpus.join(F.broadcast(bench_grams), "h")
    flagged = hits.groupBy("doc").agg(
        F.max("sz").alias("n_grams"),
        F.count(F.lit(1)).alias("n_contaminated"),
    )
    frac = F.col("n_contaminated") / F.col("n_grams")
    return flagged.select(
        "doc", "n_grams", "n_contaminated", frac.alias("frac")
    ).filter(F.col("frac") >= min_frac)


def duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_count: int = 2,
    hash_fn=None,
) -> DataFrame:
    """Exact-substring duplicate spans (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): find
    every maximal run of tokens COVERED by ``window``-token substrings
    that each occur ≥ ``min_count`` times across the corpus
    (union-of-coverage semantics: overlapping and back-to-back
    duplicated windows merge into one span — the right unit for span
    REMOVAL, where adjacent duplicated regions are excised together;
    a span does not promise that every interior ``window``-gram is
    itself duplicated, only that every token lies inside one that
    is). The
    suffix-array-free relational formulation: slide a ``window``-token
    rolling hash over every document, count occurrences per hash
    corpus-wide, keep duplicated windows, and merge
    overlapping/adjacent ones into maximal spans with one
    gaps-and-islands pass per document.

    Output: (doc_id, span_start, span_end, n_windows) — token offsets,
    0-based inclusive.

    Scale shape: the only corpus-wide exchange carries (hash60,
    count) — 8-byte keys with map-side combine, never text; the
    join-back is on the same skinny key; the islands pass is one
    (doc)-partitioned sort over *duplicated windows only* (a small
    fraction of the corpus). Exactly the scan→count→merge pipeline
    that replaces an O(n) suffix array at 100 TB, at the price of a
    fixed window size.

    ``hash_fn`` defaults to the md5-derived ``hash60`` (the shared
    oracle-replayable hash); production corpora pass
    ``F.xxhash64`` — same plan, ~2× cheaper window hashing, no
    cross-engine replay.
    """
    toks = df.select(
        F.col(id_col).alias("doc"), tokens(text_col).alias("t")
    ).filter(F.size("t") >= window)
    wins = toks.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - window),
                lambda i: F.struct(
                    i.alias("start"),
                    (hash_fn or hash60)(
                        F.concat_ws(" ", F.slice("t", i + 1, window))
                    ).alias("wh"),
                ),
            )
        ).alias("w"),
    ).select("doc", F.col("w.start").alias("start"), F.col("w.wh").alias("wh"))
    # the window stream feeds the corpus count AND the join-back —
    # persist it so the rolling-hash projection (the dominant per-row
    # cost: window-gram concat + md5) runs once (capped-FIFO registered)
    from pyspark import StorageLevel

    from open_energy_data_server_spark.operators._cache import register_persisted

    wins = register_persisted(wins.persist(StorageLevel.MEMORY_AND_DISK))
    counts = wins.groupBy("wh").agg(F.count(F.lit(1)).alias("c"))
    # SHUFFLE_HASH: the equi-join back on the 8-byte key must not pay
    # sort-merge's two full sorts of the window stream (measured 4.8×
    # DuckDB at ~sf1 with SMJ, 1.?× with the hash join); both sides
    # are already hash-partitioned on wh so the build is in-place
    dup = wins.join(
        counts.filter(F.col("c") >= min_count).hint("SHUFFLE_HASH"), "wh"
    ).select("doc", "start", (F.col("start") + window - 1).alias("end"))
    w = Window.partitionBy("doc").orderBy("start")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "new_island",
        F.when(prev_max_end.isNull() | (F.col("start") > prev_max_end + 1), 1)
        .otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        flagged.groupBy("doc", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("doc").alias("doc_id"),
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
            F.col("n_windows").cast("bigint").alias("n_windows"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_count: int = 2,
    hash_fn=None,
) -> DataFrame:
    """The ACTION for ``duplicate_spans`` (Lee et al.'s actual dedup
    step): excise every duplicated span from every document and
    rebuild the text.

    → (doc_id, n_tokens, n_removed, clean_text) for every document —
    docs without spans pass through unchanged (n_removed = 0).

    Scale shape: the span table carries only flagged (doc, start, end)
    rows — a sliver of the corpus. Spans are merged maximal islands —
    disjoint and non-adjacent per doc by construction — so the rewrite
    never needs the token STREAM at all: spans collapse to one
    (doc, spans[]) row per flagged doc, join the document scan on the
    doc key, and the rebuilt text is a positional higher-order filter
    over the token array (each position is inside at most one span,
    and filter preserves array order, which IS pos order). The corpus
    text crosses zero exchanges and is tokenized exactly once; the
    only corpus-wide shuffles are the skinny ones inside
    ``duplicate_spans``. ``hash_fn`` forwards to ``duplicate_spans``
    (F.xxhash64 for production corpora).
    """
    spans = duplicate_spans(
        df, id_col, text_col, window, min_count, hash_fn=hash_fn
    ).select(F.col("doc_id").alias("doc"), "span_start", "span_end")
    # one row per flagged doc; groupBy(doc) reuses the (doc) hash
    # partitioning the islands window already established — no new
    # exchange. n_removed = Σ span lengths exactly, because merged
    # islands are disjoint and every span lies inside [0, n_tokens).
    spans_doc = spans.groupBy("doc").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("n_cut"),
    )
    base = df.select(F.col(id_col).alias("doc"), tokens(text_col).alias("t")).filter(
        F.col("t").isNotNull()
    )
    no_spans = F.array().cast("array<struct<span_start:bigint,span_end:bigint>>")
    sp = F.coalesce(F.col("spans"), no_spans)
    kept = F.filter(
        "t",
        lambda _, i: ~F.exists(
            sp, lambda s: (i >= s["span_start"]) & (i <= s["span_end"])
        ),
    )
    return base.join(spans_doc, "doc", "left").select(
        F.col("doc").alias("doc_id"),
        F.size("t").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("n_cut"), F.lit(0)).cast("bigint").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )
