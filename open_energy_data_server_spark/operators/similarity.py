"""Similarity search over embedding columns (array<float>).

Two paths, per the north star:
- brute-force cosine top-k (the correctness baseline) — expressed
  relationally via posexplode + fixed-point dot products so DuckDB
  replays it bit-for-bit;
- LSH hyperplane bucketing (the scale path) — pseudo-random ±1
  hyperplanes generated *arithmetically* ((i·31 + j·17) mod 2), so
  the same planes exist engine-independently with no literal blobs.

Scale notes: brute-force is O(|Q|·|N|·d) — fine for a bounded query
set against a big corpus (it's one broadcast join), wrong for all-
pairs. The LSH variant buckets the corpus once (a scan), then probes
only matching buckets; at 100 TB, bucket IDs become the partition
key so a probe touches one partition per table.

There is also a fast JVM dot product (`cosine_zip`) using
zip_with/aggregate for engine-internal use — same math, sequential
fold, ~no shuffle; the oracle queries use the fixed-point form.
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


def unpack_components(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, pos, val) long form of an embedding column — the relational
    representation every oracle-checked similarity op builds on."""
    return df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).withColumn("val", F.col("val").cast("double"))


def _fixed_sum(col: Column) -> Column:
    return F.sum(F.round(col * SCALE, 0).cast("bigint")).cast("double") / float(SCALE)


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: query set (small, broadcast) against the
    full corpus. Returns (query_id, neighbor_id, cosine, rank)."""
    comp = unpack_components(df, id_col, vec_col)
    norms = comp.groupBy("vid").agg(_fixed_sum(F.col("val") * F.col("val")).alias("norm2"))

    q = comp.filter(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("qid"), "pos", F.col("val").alias("qval")
    )
    dots = (
        comp.join(F.broadcast(q), "pos")
        .filter(F.col("vid") != F.col("qid"))
        .groupBy("qid", "vid")
        .agg(_fixed_sum(F.col("val") * F.col("qval")).alias("dot"))
    )
    qn = norms.select(F.col("vid").alias("qid"), F.col("norm2").alias("qnorm2"))
    nn = norms.select("vid", F.col("norm2").alias("nnorm2"))
    cos = F.col("dot") / (F.sqrt("qnorm2") * F.sqrt("nnorm2"))
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vid"))
    return (
        dots.join(F.broadcast(qn), "qid")
        .join(nn, "vid")
        .withColumn("cosine", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "cosine",
            "rank",
        )
    )


def hyperplane_buckets(df: DataFrame, id_col: str, vec_col: str, n_planes: int = 12) -> DataFrame:
    """LSH bucket id per vector: bit j = sign(Σᵢ vᵢ · pⱼᵢ) with
    pⱼᵢ = +1 when (i·31 + j·17) mod 2 = 0 else −1.

    Returns (id, bucket bigint). Engine-twin SQL uses the identical
    arithmetic, so bucketing matches across engines exactly (sign
    flips on an exact-zero sum are excluded by the fixed-point sum).
    """
    comp = unpack_components(df, id_col, vec_col)
    # all planes in ONE agg pass (minhash_wide pattern): n_planes
    # conditional fixed-point sums per vector — no plane crossJoin, no
    # second aggregation; shuffle carries one wide row per vector
    projs = [
        _fixed_sum(
            F.col("val") * (1 - 2 * ((F.col("pos") * 31 + j * 17) % 2))
        ).alias(f"p{j}")
        for j in range(n_planes)
    ]
    sums = comp.groupBy("vid").agg(*projs)
    bucket = F.lit(0).cast("bigint")
    for j in range(n_planes):
        bucket = bucket + F.when(
            F.col(f"p{j}") >= 0, F.lit(2**j).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return sums.select(F.col("vid").alias("id"), bucket.alias("bucket"))


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup-suite member
    for vector columns): all (a, b) with cosine ≥ threshold.

    Relational fixed-point formulation (oracle-replayable). Candidate
    generation is O(pairs·d) within a block — callers MUST bound the
    pair space at scale: pass ``block_col`` (LSH bucket from
    ``hyperplane_buckets``, a label, or a shard key); unblocked input
    is for sampled/small sets only.
    """
    comp = unpack_components(df, id_col, vec_col)
    if block_col is not None:
        blocks = df.select(F.col(id_col).alias("vid"), F.col(block_col).alias("__blk"))
        comp = comp.join(blocks, "vid")
        join_keys = ["pos", "__blk"]
    else:
        join_keys = ["pos"]
    norms = comp.groupBy("vid").agg(_fixed_sum(F.col("val") * F.col("val")).alias("norm2"))

    a = comp.select(*([F.col("vid").alias("va"), "pos", F.col("val").alias("xa")] + ([F.col("__blk")] if block_col else [])))
    b = comp.select(*([F.col("vid").alias("vb"), "pos", F.col("val").alias("xb")] + ([F.col("__blk")] if block_col else [])))
    dots = (
        a.join(b, join_keys)
        .filter(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(_fixed_sum(F.col("xa") * F.col("xb")).alias("dot"))
    )
    na = norms.select(F.col("vid").alias("va"), F.col("norm2").alias("na"))
    nb = norms.select(F.col("vid").alias("vb"), F.col("norm2").alias("nb"))
    cos = F.col("dot") / (F.sqrt("na") * F.sqrt("nb"))
    return (
        dots.join(na, "va")
        .join(nb, "vb")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("va").alias("id_a"), F.col("vb").alias("id_b"), "cosine")
    )
