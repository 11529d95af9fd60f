"""Similarity search over embedding columns (array<float>).

Two paths, per the north star:
- brute-force cosine top-k (the correctness baseline);
- LSH hyperplane bucketing (the scale path) — pseudo-random ±1
  hyperplanes generated *arithmetically* ((i·31 + j·17) mod 2), so
  the same planes exist engine-independently with no literal blobs.

All dot products / norms are per-row ``zip_with`` + ``aggregate``
folds over the array column with per-term fixed-point rounding
(``fixed_dot``): the values are bit-identical to the relational
posexplode → Σ round(term·S) formulation the DuckDB oracles run, but
the Spark plan never explodes components — a vector row costs d
codegen'd multiply-rounds in the scan projection, ZERO shuffles
(measured 6× over the explode/join/agg form at sf0.1).

Scale notes: brute-force is O(|Q|·|N|·d) — fine for a bounded query
set against a big corpus (it's one broadcast join), wrong for all-
pairs. The LSH variant buckets the corpus once (a scan), then probes
only matching buckets; at 100 TB, bucket IDs become the partition
key so a probe touches one partition per table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from open_energy_data_server_spark.constants import SCALE


def cosine_zip(a: Column, b: Column) -> Column:
    """JVM-side cosine via zip_with + fold (engine-internal fast path)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def fixed_round(z: Column) -> Column:
    """Half-away-from-zero to integer as PURE double arithmetic:
    sign(z)·floor(|z|+0.5), cast to bigint. Bit-identical to the
    oracle twin ``CAST(SIGN(z)*FLOOR(ABS(z)+0.5) AS BIGINT)`` because
    both engines evaluate the same IEEE-754 op sequence — stronger
    than relying on two engines' ROUND agreeing — and ~2.3× faster
    than ``F.round``, whose JVM evaluation allocates a BigDecimal per
    term (measured 3.7 s → 1.6 s on the 125k-pair semdedup fold and
    5.2 s → ~2 s on the 16-centroid assignment at sf0.1; the folds
    are CodegenFallback, so per-term constants dominate)."""
    return (F.signum(z) * F.floor(F.abs(z) + F.lit(0.5))).cast("bigint")


def fixed_round_sql(z: str) -> str:
    """The oracle-side twin of ``fixed_round`` (same IEEE ops)."""
    return f"CAST(SIGN({z}) * FLOOR(ABS({z}) + 0.5) AS BIGINT)"


def _fixed_sum(col: Column) -> Column:
    return F.sum(fixed_round(col * SCALE)).cast("double") / float(SCALE)


def fixed_dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Fixed-point dot product per row: each term rounds to 1/SCALE
    (exactly like ``_fixed_sum``'s relational twin, so DuckDB oracles
    replay it bit-for-bit), terms accumulate as exact bigints. No
    explode, no shuffle.

    Default is a zip_with/aggregate fold. Passing ``dim`` unrolls the
    d terms into plain expressions instead — measured WORSE end to
    end at d=64 (2.8 s plan-build via py4j + slower execution from
    the oversized codegen method vs 0.3 s / 1.0 s for the fold), so
    only use it if a future Spark profiles otherwise."""
    if dim is not None:
        total = None
        for i in range(dim):
            term = fixed_round(a[i].cast("double") * b[i].cast("double") * SCALE)
            total = term if total is None else total + term
        return total.cast("double") / float(SCALE)
    return (
        F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: fixed_round(x.cast("double") * y.cast("double") * SCALE),
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).cast("double")
        / float(SCALE)
    )


def fixed_norm2(a: Column, dim: int | None = None) -> Column:
    """Fixed-point squared norm (twin of Σ round(v²·S))."""
    return fixed_dot(a, a, dim=dim)


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: query set (small, broadcast) against the
    full corpus. Returns (query_id, neighbor_id, cosine, rank).

    Shape: corpus scan × broadcast query rows → per-row zip_with dot
    fold (d multiply-rounds per pair, all inside whole-stage codegen)
    → one shuffle of |Q|·|corpus| skinny score rows for the per-query
    top-k window. No component explode, no dot-product aggregation
    shuffle — at 100 TB the corpus is read once at scan speed."""
    qdf = (
        df.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qvec"),
            fixed_norm2(F.col(vec_col)).alias("qnorm2"),
        )
    )
    pairs = (
        df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            fixed_norm2(F.col(vec_col)).alias("nnorm2"),
        )
        .join(F.broadcast(qdf), F.col("vid") != F.col("qid"))
        .withColumn("dot", fixed_dot(F.col("vec"), F.col("qvec")))
    )
    cos = F.col("dot") / (F.sqrt("qnorm2") * F.sqrt("nnorm2"))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vid"))
    return (
        pairs.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def hyperplane_buckets(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int = 12, dim: int | None = None
) -> DataFrame:
    """LSH bucket id per vector: bit j = sign(Σᵢ vᵢ · pⱼᵢ) with
    pⱼᵢ = +1 when (i·31 + j·17) mod 2 = 0 else −1.

    Returns (id, bucket bigint). Engine-twin SQL uses the identical
    arithmetic, so bucketing matches across engines exactly (sign
    flips on an exact-zero sum are excluded by the fixed-point sum).

    Known ``dim`` (the fast path — pass it when the column is fixed-
    width) UNROLLS the planes: half-away-from-zero rounding
    (``fixed_round``) is odd-symmetric, so
    round(vᵢ·pⱼᵢ·S) = pⱼᵢ·round(vᵢ·S) and the d rounded components
    are projected ONCE, then each plane is a ±add chain inside
    whole-stage codegen — measured 3× faster per pass than the fold
    (0.32 s vs 1.0 s noop at sf0.1). The unrolled tree is built as a
    SQL string (one JVM-side parse, ~0.1 s) because constructing the
    same ~2 500-node tree through py4j Column algebra costs ~3 s of
    driver time per call. dim=None is the general path for ragged /
    unknown-width vectors: per-plane zip_with folds."""
    if dim is not None:
        inner = df.selectExpr(
            f"{id_col} AS id",
            *[
                f"{fixed_round_sql(f'CAST({vec_col}[{i}] AS DOUBLE) * {SCALE}')} AS r{i}"
                for i in range(dim)
            ],
        )
        parts = []
        for j in range(n_planes):
            terms = " + ".join(
                ("" if (i * 31 + j * 17) % 2 == 0 else "-") + f"r{i}"
                for i in range(dim)
            ).replace("+ -", "- ")
            parts.append(
                f"(CASE WHEN ({terms}) >= 0 THEN CAST({2 ** j} AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END)"
            )
        return inner.selectExpr("id", "(" + " + ".join(parts) + ") AS bucket")

    vec = F.col(vec_col)
    bucket = F.lit(0).cast("bigint")
    idx = F.sequence(F.lit(0), F.size(vec) - 1)

    def _term(j: int):
        def f(v: Column, i: Column) -> Column:
            return fixed_round(
                v.cast("double") * (1 - 2 * ((i * 31 + j * 17) % 2)) * SCALE
            )

        return f

    for j in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, idx, _term(j)),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(2**j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return df.select(F.col(id_col).alias("id"), bucket.alias("bucket"))


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str | None = None,
    allow_quadratic: bool = False,
    block_out: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-suite member
    for vector columns): all (a, b) with cosine ≥ threshold.

    Candidate generation is O(pairs·d) within a block — callers MUST
    bound the pair space at scale: pass ``block_col`` (LSH bucket from
    ``hyperplane_buckets``, a label, or a shard key). The unblocked
    cross join is for sampled/small sets only and must be opted into
    with ``allow_quadratic=True`` — otherwise it raises.

    ``block_out``: emit the blocking value as an output column under
    this name (rides along on the pair rows — no extra join).

    Round-10 optimization (guide §4.2): the pair arithmetic runs in
    the Arrow-batched exact kernel ``vecexact.blocked_pairs`` — the
    IDENTICAL fixed-point IEEE-754 op sequence as the relational
    self-join formulation (``cosine_neardup_pairs_expr``, kept below
    and pinned equal by tests/test_vecexact.py), but each pair costs
    vectorized float64 ops instead of d interpreted CodegenFallback
    fold steps. Plan: ONE exchange (hash by block) instead of the
    self-join's two persisted-side reads — and on a bucketed-by-block
    layout zero exchanges (tests/test_bucketed.py). Measured at
    sf0.1: q_semdedup_pairs 0.94 s → see OPTIMIZATION_r10.md."""
    if block_col is None and not allow_quadratic:
        raise ValueError(
            "cosine_neardup_pairs without block_col is O(n²); pass a "
            "blocking column (e.g. hyperplane_buckets) or opt in with "
            "allow_quadratic=True for sampled/small sets"
        )
    from open_energy_data_server_spark.operators.vecexact import blocked_pairs

    if block_col is None:
        # opted-in quadratic path: one synthetic block → a single
        # grouped kernel task computes the full upper triangle (the
        # sampled/small-set contract of allow_quadratic)
        assigned = df.select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            F.lit(0).alias("__blk"),
        )
        return blocked_pairs(
            assigned, "vid", "vec", "__blk", threshold, block_out=None
        )
    assigned = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.col(block_col).alias("__blk"),
    )
    out = blocked_pairs(
        assigned,
        "vid",
        "vec",
        "__blk",
        threshold,
        block_out=block_out,
    )
    return out


def cosine_neardup_pairs_expr(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str | None = None,
    allow_quadratic: bool = False,
    block_out: str | None = None,
) -> DataFrame:
    """The relational (expression-tree) formulation of
    ``cosine_neardup_pairs`` — the form the DuckDB oracles replay
    term-for-term. Kept as the exactness pin for the Arrow kernel
    (tests/test_vecexact.py asserts pair sets AND cosines identical);
    the public operator routes through ``vecexact.blocked_pairs``
    because these folds are CodegenFallback (interpreted per array
    element, the dominant cost of the pair search — guide §4.2).
    """
    if block_col is None and not allow_quadratic:
        raise ValueError(
            "cosine_neardup_pairs without block_col is O(n²); pass a "
            "blocking column (e.g. hyperplane_buckets) or opt in with "
            "allow_quadratic=True for sampled/small sets"
        )
    base_cols = [
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        fixed_norm2(F.col(vec_col)).alias("norm2"),
    ]
    if block_col is not None:
        base_cols.append(F.col(block_col).alias("__blk"))
    base = df.select(*base_cols)
    # base (norms + blocking key — for SemDeDup the whole codebook
    # assignment) feeds BOTH sides of the self-join; persist it so
    # that upstream pipeline runs once, not twice (capped-FIFO
    # registered; at 100 TB the equivalent is the bucketed-by-block
    # layout the scale notes prescribe)
    from pyspark import StorageLevel

    from open_energy_data_server_spark.operators._cache import register_persisted

    base = register_persisted(base.persist(StorageLevel.MEMORY_AND_DISK))
    a = base.select(
        *[F.col(c).alias(c + "_a") for c in ("vid", "vec", "norm2")]
        + ([F.col("__blk")] if block_col else [])
    )
    b = base.select(
        *[F.col(c).alias(c + "_b") for c in ("vid", "vec", "norm2")]
        + ([F.col("__blk")] if block_col else [])
    )
    if block_col is not None:
        pairs = a.join(b, "__blk")
    else:
        pairs = a.crossJoin(b)
    cos = fixed_dot(F.col("vec_a"), F.col("vec_b")) / (
        F.sqrt("norm2_a") * F.sqrt("norm2_b")
    )
    extra = (
        [F.col("__blk").alias(block_out)]
        if (block_out is not None and block_col is not None)
        else []
    )
    return (
        pairs.filter(F.col("vid_a") < F.col("vid_b"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("vid_a").alias("id_a"),
            F.col("vid_b").alias("id_b"),
            *extra,
            "cosine",
        )
    )


def ivf_scores(
    vec: Column, norm2: Column, centroids: list[tuple[int, list[float]]]
) -> Column:
    """array<struct<negcos,cid>> of (exact-arithmetic) cosine scores
    against literal centroid vectors, sorted best-first — ascending
    struct order on (−cosine, cid) ≡ cosine DESC, cid ASC, the same
    tie-break the SQL oracle's ROW_NUMBER uses. Pure projection: the
    centroid table is plan-embedded (the IVF analog of a broadcast),
    so coarse quantization of a 100 TB corpus is zero-shuffle."""
    entries = []
    for cid, cvec in centroids:
        lit_vec = F.array(*[F.lit(float(x)) for x in cvec])
        cos = fixed_dot(vec, lit_vec) / (
            F.sqrt(norm2) * F.sqrt(fixed_norm2(lit_vec))
        )
        entries.append(F.struct((-cos).alias("negcos"), F.lit(cid).alias("cid")))
    return F.array_sort(F.array(*entries))


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, centroids: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vid, cluster) — IVF coarse quantization: nearest centroid by
    cosine. Centroids come from an offline training step (k-means or,
    for deterministic conformance, a fixed sample); assignment itself
    is the scan-speed engine op."""
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        fixed_norm2(F.col(vec_col)).alias("norm2"),
    )
    # generator barrier: keep one materialized scores array per row
    scored = base.select(
        "vid",
        F.explode(
            F.array(ivf_scores(F.col("vec"), F.col("norm2"), centroids))
        ).alias("sc"),
    )
    return scored.select("vid", F.col("sc")[0]["cid"].alias("cluster"))


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    n_centroids: int = 16,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """IVF approximate top-k (the ANN scale path beside LSH): coarse
    centroids = the ``n_centroids`` lowest-id vectors (deterministic
    stand-in for an offline k-means codebook); every corpus vector is
    assigned to its nearest centroid (zero-shuffle projection, see
    ``ivf_assign``); a query probes only its ``nprobe`` nearest
    centroids' inverted lists and ranks those candidates exactly.

    At 100 TB the corpus is written partitioned/bucketed BY cluster, so
    a probe reads nprobe/n_centroids of the data — candidate
    generation here is a broadcast of |Q|·nprobe probe rows against
    the cluster-assigned corpus, one shuffle for the final top-k
    window over |candidates| skinny rows."""
    centroids = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in df.filter(F.col(id_col) < n_centroids)
        .select(id_col, vec_col)
        .collect()
    ]
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        fixed_norm2(F.col(vec_col)).alias("norm2"),
    )
    scored = base.select(
        "vid",
        "vec",
        "norm2",
        F.explode(
            F.array(ivf_scores(F.col("vec"), F.col("norm2"), centroids))
        ).alias("sc"),
    )
    assigned = scored.select(
        "vid", "vec", "norm2", F.col("sc")[0]["cid"].alias("cluster")
    )
    probes = (
        scored.filter(F.col("vid").isin(query_ids))
        .select(
            F.col("vid").alias("qid"),
            F.col("vec").alias("qvec"),
            F.col("norm2").alias("qnorm2"),
            F.explode(F.slice(F.col("sc"), 1, nprobe)).alias("p"),
        )
        .select("qid", "qvec", "qnorm2", F.col("p")["cid"].alias("cluster"))
    )
    cand = assigned.join(F.broadcast(probes), "cluster").filter(
        F.col("vid") != F.col("qid")
    )
    cos = fixed_dot(F.col("vec"), F.col("qvec")) / (
        F.sqrt("norm2") * F.sqrt("qnorm2")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vid"))
    return (
        cand.withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def _lowid_codebook(
    df: DataFrame, id_col: str, vec_col: str, n_clusters: int
) -> list[tuple[int, list[float]]]:
    """The deterministic stand-in codebook (vectors with id <
    ``n_clusters``), validated: a corpus whose ids don't cover
    0..n_clusters-1 fails loudly here instead of silently blocking on
    a short (or empty → null-keyed, zero-pair) codebook downstream."""
    centroids = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in df.filter(F.col(id_col) < n_clusters)
        .select(id_col, vec_col)
        .orderBy(id_col)  # id order regardless of file/partition layout
        .collect()
    ]
    if len(centroids) < n_clusters:
        raise ValueError(
            f"codebook shortfall: wanted {n_clusters} centroids but only "
            f"{len(centroids)} rows have {id_col} < {n_clusters}; pass a "
            "smaller n_clusters or a corpus whose ids cover the range"
        )
    return centroids


def semdedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 8,
    threshold: float = 0.3,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs
    found by clustering the embedding space first and comparing only
    *within* clusters — the principled blocking scheme for
    embedding-cosine dedup at corpus scale.

    Codebook: the ``n_clusters`` lowest-id vectors (the deterministic
    stand-in the IVF path also uses; swap in an offline k-means
    codebook in production — the assignment/blocking machinery is
    identical). The pair search is blocked on the cluster id, so
    candidate generation is Σ|cluster|² instead of |corpus|² — and at
    100 TB the corpus is written bucketed BY cluster, making the pair
    stage co-partitioned and shuffle-free.

    Round-10 optimization (guide §4.2): assignment AND pair search run
    in the Arrow-batched exact kernels (``vecexact.exact_assign`` /
    ``blocked_pairs``) — bit-identical fixed-point arithmetic to the
    relational form (``semdedup_pairs_expr``, pinned by
    tests/test_vecexact.py; the DuckDB oracle is unchanged), with the
    |pairs|·d interpreted fold steps replaced by vectorized float64
    ops. Plan: scan → ArrowEval assign (map-only) → ONE exchange on
    cluster → grouped pair kernel; the old plan persisted the assigned
    base and read it from both self-join sides. Measured: scale10
    45.0 s → see OPTIMIZATION_r10.md; sf0.1 0.94 s → ~0.3 s.

    Output: (id_a, id_b, cluster, cosine) with id_a < id_b and
    cosine ≥ threshold.
    """
    from open_energy_data_server_spark.operators.vecexact import exact_assign

    centroids = _lowid_codebook(df, id_col, vec_col, n_clusters)
    assigned = exact_assign(df, id_col, vec_col, centroids)
    return cosine_neardup_pairs(
        assigned,
        "vid",
        "vec",
        threshold=threshold,
        block_col="cluster",
        block_out="cluster",
    ).select("id_a", "id_b", "cluster", "cosine")


def semdedup_pairs_expr(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 8,
    threshold: float = 0.3,
) -> DataFrame:
    """The relational (expression-tree) formulation of
    ``semdedup_pairs`` — zero-shuffle ``ivf_scores`` assignment
    projection feeding the blocked self-join. This is the form the
    DuckDB oracle replays; kept as the exactness pin for the Arrow
    kernels (tests/test_vecexact.py) after the round-10 swap."""
    centroids = _lowid_codebook(df, id_col, vec_col, n_clusters)
    # cluster id computed in the SAME projection as the vectors (the
    # ivf_topk shape) — no assignment join, and the block value rides
    # the pair rows out via block_out instead of a corpus-sized
    # broadcast re-join (which would OOM the driver at real scale)
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col),
        fixed_norm2(F.col(vec_col)).alias("norm2"),
    )
    scored = base.select(
        "vid",
        vec_col,
        F.explode(
            F.array(ivf_scores(F.col(vec_col), F.col("norm2"), centroids))
        ).alias("sc"),
    )
    withblk = scored.select(
        "vid", vec_col, F.col("sc")[0]["cid"].cast("int").alias("cluster")
    )
    return cosine_neardup_pairs_expr(
        withblk,
        "vid",
        vec_col,
        threshold=threshold,
        block_col="cluster",
        block_out="cluster",
    ).select("id_a", "id_b", "cluster", "cosine")


def semdedup_pairs_gemm(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int = 8,
    threshold: float = 0.3,
    row_block: int = 1024,
) -> DataFrame:
    """Production fast path for ``semdedup_pairs``: identical
    clustering/blocking, but the within-cluster pair cosines run as
    blockwise matrix products in an Arrow-batched ``applyInPandas``
    per cluster (normalize members once, then S = A[i:i+b] · Aᵀ per
    row block, emit the upper-triangle hits ≥ threshold).

    Why a Python stage is the right call HERE (the engine's 4th
    documented Arrow seam): a dense d-dim dot per candidate pair is
    BLAS territory — numpy GEMM does |c|²·d flops at memory bandwidth,
    far beyond per-pair expression-tree evaluation, and nothing needs
    the fixed-point determinism the conformance variant exists for
    (measured at sf0.1, 8-cluster codebook: 5.3 s relational /
    oracle-parity path vs 1.4 s this path, identical pair set; the
    relational path has since dropped to ~1.9 s with the 16-cluster
    default — the GEMM advantage grows with |cluster| either way).
    Row-blocking keeps peak
    memory at O(row_block · |c|) per task regardless of cluster size;
    the shuffle key is the cluster id, so at 100 TB a cluster's
    members land in one task from a bucketed-by-cluster layout with
    no extra exchange.

    Float contract: cosines are plain float64 dots (not fixed-point),
    so values can differ from ``semdedup_pairs`` in the last ulp;
    pair SETS match for any threshold not within ~1e-9 of a pair's
    cosine. Output schema matches ``semdedup_pairs``.
    """
    import numpy as np
    import pandas as pd

    centroids = _lowid_codebook(df, id_col, vec_col, n_clusters)
    assigned = ivf_assign(df, id_col, vec_col, centroids)
    withblk = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")).join(
        assigned, "vid"
    )

    def find_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vid"].to_numpy()
        a = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        norms = np.sqrt((a * a).sum(axis=1))
        norms[norms == 0.0] = 1.0
        a = a / norms[:, None]
        cluster = int(pdf["cluster"].iloc[0])
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        for lo in range(0, n, row_block):
            hi = min(lo + row_block, n)
            sims = a[lo:hi] @ a.T  # (hi-lo, n)
            for i in range(lo, hi):
                row = sims[i - lo]
                js = np.nonzero(row >= threshold)[0]
                for j in js:
                    if ids[i] < ids[j]:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_c.append(row[j])
        return pd.DataFrame(
            {
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "cluster": pd.Series([cluster] * len(out_a), dtype="int32"),
                "cosine": pd.Series(out_c, dtype="float64"),
            }
        )

    return withblk.groupBy("cluster").applyInPandas(
        find_pairs, "id_a bigint, id_b bigint, cluster int, cosine double"
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011) — the compressed-domain ANN
# path: a d-dim float vector (d·4 bytes) becomes m sub-space codes
# (m bytes at 256 codes/subspace), and query scoring runs against the
# codes alone via per-subspace distance tables. At 100 TB this is the
# difference between scanning 25 TB of raw vectors and 0.4 TB of codes.


def _fixed_l2_scaled(a: Column, blist: list[float]) -> Column:
    """Σ round((aᵢ−bᵢ)²·SCALE) as an exact BIGINT (the fixed-point
    squared L2 the PQ paths rank by; staying in scaled integers keeps
    argmin ties and sums bit-identical across engines)."""
    lit_vec = F.array(*[F.lit(float(x)) for x in blist])

    def term(x: Column, y: Column) -> Column:
        d = x.cast("double") - y
        return fixed_round(d * d * F.lit(float(SCALE)))

    return F.aggregate(
        F.zip_with(a, lit_vec, term),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_codes: int = 16,
    m: int = 4,
    dsub: int = 16,
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace codebook: subspace s's entries are the s-th
    dsub-dim slices of the ``n_codes`` lowest-id vectors (the same
    deterministic stand-in convention as the IVF/SemDeDup codebooks —
    production swaps in per-subspace k-means trained with
    ``operators.kmeans``; every consumer below only sees
    ``[(code, subvector)]`` per subspace). Bounded driver metadata:
    n_codes·m·dsub scalars.

    Validates that the embedding dimension is exactly ``m * dsub``
    (on the sampled vectors, which are on the driver anyway): a wider
    vector would emit subspace ids >= m downstream in ``pq_adc_topk``
    (IndexError after the dtable collect), a narrower one would
    zero-fill LUT slots and silently deflate distances."""
    full = _lowid_codebook(df, id_col, vec_col, n_codes)
    want = m * dsub
    for code, vec in full:
        if len(vec) != want:
            raise ValueError(
                f"pq_codebook: vector id {code} has dimension {len(vec)}, "
                f"but m*dsub = {m}*{dsub} = {want} — PQ subspace slicing "
                "requires the embedding dimension to equal m*dsub"
            )
    return [
        [(code, vec[s * dsub : (s + 1) * dsub]) for code, vec in full]
        for s in range(m)
    ]


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: list[list[tuple[int, list[float]]]],
    dsub: int = 16,
) -> DataFrame:
    """(vid, code_0..code_{m-1}) — each subspace's nearest codebook
    entry by fixed-point squared L2, ties to the lowest code id.
    Map-only / zero-shuffle either way; at 100 TB the codes are
    written next to the vectors at ingest and queries never touch the
    raw embedding column again.

    Round-10 optimization (guide §4.2): routed through the Arrow-
    batched exact kernel ``vecexact.pq_encode_exact`` — identical
    codes (pinned by tests/test_pq.py + the unchanged DuckDB oracle),
    but the m·n_codes fixed-point L2 folds per row run as vectorized
    float64 ops instead of interpreted CodegenFallback aggregates, and
    the plan is one Arrow node instead of a 64-aggregate expression
    forest (which also cost ~0.3 s Catalyst/codegen per cold build).
    The expression formulation is kept as ``pq_encode_expr`` (the
    oracle-replayable form, and the vecexact pin)."""
    from open_energy_data_server_spark.operators.vecexact import pq_encode_exact

    return pq_encode_exact(df, id_col, vec_col, codebook, dsub=dsub)


def pq_encode_expr(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: list[list[tuple[int, list[float]]]],
    dsub: int = 16,
) -> DataFrame:
    """The expression-tree formulation of ``pq_encode``: the codebook
    is plan-embedded (the PQ analog of a broadcast) and every subspace
    argmin is an array_sort over n_codes (dist, code) structs. The
    relational form the DuckDB oracle replays — kept as the exactness
    pin for ``vecexact.pq_encode_exact``."""
    cols = [F.col(id_col).alias("vid")]
    for s, entries in enumerate(codebook):
        sub = F.slice(F.col(vec_col), s * dsub + 1, dsub)
        scored = F.array(
            *[
                F.struct(
                    _fixed_l2_scaled(sub, cvec).alias("dist"),
                    F.lit(int(code)).alias("code"),
                )
                for code, cvec in entries
            ]
        )
        cols.append(F.array_sort(scored)[0]["code"].alias(f"code_{s}"))
    return df.select(*cols)


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    n_codes: int = 16,
    m: int = 4,
    dsub: int = 16,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query keeps
    its exact vector, the corpus is represented only by its codes, and
    dist(q, x) ≈ Σ_s dtable[q, s, code_s(x)] where dtable holds the
    exact fixed-point L2 from q's s-th slice to every codebook entry.

    Everything derives from the raw table, so the DuckDB oracle
    replays it end to end:
      1. encode — zero-shuffle projection (``pq_encode``);
      2. dtable — |Q|·m·n_codes skinny rows computed by re-joining the
         query vectors' components against the codebook vectors'
         components (both tiny filters of the corpus). The table is
         bounded plan-BUILD metadata, so it is collected and embedded
         as literal per-subspace lookup arrays — the same prepared-
         statement pattern as the IVF/k-means centroid tables (its
         fixed-point bigints are exactly what the oracle recomputes);
      3. score — dist(q, x) is then a PURE PROJECTION over the code
         columns (m array lookups per query), and the only exchange
         in the whole query is the final top-k window over |Q|·N
         skinny score rows. (A broadcast-join + (vid, qid) hash-agg
         formulation of step 3 measured 4× slower at ~sf1 — the agg
         shuffle of m·N·|Q| rows is pure overhead when the dtable
         fits in the plan.)
    The corpus vector column is read once (encode); scoring touches
    codes only — the compressed-domain property that makes PQ the
    100 TB ANN workhorse.

    Output: (query_id, neighbor_id, adc_dist_scaled, rank) — distances
    stay in SCALE-scaled exact bigints (ascending = nearest)."""
    codebook = pq_codebook(df, id_col, vec_col, n_codes=n_codes, m=m, dsub=dsub)
    encoded = pq_encode(df, id_col, vec_col, codebook, dsub=dsub)

    # (qid, s, i, qval) / (code, s, i, cval) component streams — tiny
    qcomp = (
        df.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("qid"), F.posexplode(F.col(vec_col)))
        .select(
            "qid",
            (F.col("pos") / dsub).cast("int").alias("s"),
            (F.col("pos") % dsub).alias("i"),
            F.col("col").cast("double").alias("qval"),
        )
    )
    ccomp = (
        df.filter(F.col(id_col) < n_codes)
        .select(F.col(id_col).alias("code"), F.posexplode(F.col(vec_col)))
        .select(
            "code",
            (F.col("pos") / dsub).cast("int").alias("s"),
            (F.col("pos") % dsub).alias("i"),
            F.col("col").cast("double").alias("cval"),
        )
    )
    diff = F.col("qval") - F.col("cval")
    dtable = (
        qcomp.join(ccomp, ["s", "i"])
        .groupBy("qid", "s", "code")
        .agg(
            F.sum(fixed_round(diff * diff * F.lit(float(SCALE))))
            .cast("bigint")
            .alias("sub_dist")
        )
    )
    # bounded |Q|·m·n_codes metadata → plan-embedded lookup arrays
    lut: dict[int, list[list[int]]] = {
        int(q): [[0] * n_codes for _ in range(m)] for q in query_ids
    }
    seen_qids: set[int] = set()
    for r in dtable.collect():
        seen_qids.add(int(r["qid"]))
        lut[int(r["qid"])][int(r["s"])][int(r["code"])] = int(r["sub_dist"])
    missing = sorted(set(int(q) for q in query_ids) - seen_qids)
    if missing:
        raise ValueError(
            f"pq_adc_topk: query ids {missing} not present in the corpus — "
            "an all-zero distance table would silently rank every vector "
            "at distance 0"
        )

    entries = []
    for qid in sorted(lut):
        dist = None
        for s in range(m):
            arr = F.array(
                *[F.lit(v).cast("bigint") for v in lut[qid][s]]
            )
            term = F.element_at(arr, F.col(f"code_{s}") + 1)
            dist = term if dist is None else dist + term
        entries.append(
            F.struct(
                F.lit(qid).cast("bigint").alias("qid"),
                dist.cast("bigint").alias("adc_dist_scaled"),
            )
        )
    scored = (
        encoded.select("vid", F.explode(F.array(*entries)).alias("e"))
        .select("vid", F.col("e.qid").alias("qid"),
                F.col("e.adc_dist_scaled").alias("adc_dist_scaled"))
        .filter(F.col("vid") != F.col("qid"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(
        F.col("adc_dist_scaled").asc(), F.col("vid").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "adc_dist_scaled",
            "rank",
        )
    )


def pq_encode_gemm(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebook: list[list[tuple[int, list[float]]]],
    dsub: int = 16,
) -> DataFrame:
    """Production fast path for ``pq_encode``: identical per-subspace
    argmin, but evaluated as batched numpy matrix products in an
    Arrow ``mapInPandas`` — ‖x‖² − 2xCᵀ + ‖c‖² per batch is BLAS
    territory, the same reasoning as ``semdedup_pairs_gemm`` (the
    engine's documented Arrow seams). Map-only: no shuffle, no state,
    scales exactly like the relational encode.

    Float contract: distances are plain float64 (not fixed-point), so
    an assignment can differ from ``pq_encode`` only when two codebook
    entries lie within ~1e-6 quantization distance of a vector — ties
    break to the lowest code on both paths. Output schema matches
    ``pq_encode``."""
    import numpy as np
    import pandas as pd

    m = len(codebook)
    cbs = [
        np.asarray([c for _, c in entries], dtype=np.float64)
        for entries in codebook
    ]
    code_ids = [
        np.asarray([code for code, _ in entries], dtype=np.int64)
        for entries in codebook
    ]
    for s, entries in enumerate(codebook):
        order = [code for code, _ in entries]
        if order != sorted(order):
            raise ValueError(
                "pq_encode_gemm needs codebook entries sorted by code id "
                f"(subspace {s}) so argmin tie-breaks match pq_encode"
            )

    schema = "vid bigint, " + ", ".join(f"code_{s} int" for s in range(m))

    def enc(batches):
        for pdf in batches:
            a = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            out = {"vid": pdf[id_col].astype("int64")}
            for s in range(m):
                x = a[:, s * dsub : (s + 1) * dsub]
                d = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ cbs[s].T)
                    + (cbs[s] * cbs[s]).sum(axis=1)[None, :]
                )
                out[f"code_{s}"] = code_ids[s][np.argmin(d, axis=1)].astype(
                    "int32"
                )
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(enc, schema)
