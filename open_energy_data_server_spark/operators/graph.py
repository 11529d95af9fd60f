"""Distributed connected components — dedup-group resolution.

Every near-dup operator in the engine (MinHash-LSH, SimHash, n-gram
Jaccard, embedding cosine, SemDeDup, dHash) emits candidate PAIRS;
production dedup needs the transitive closure of those pairs — each
document's duplicate GROUP and one keeper per group. That closure is
connected components over the pair graph.

Algorithm: min-label propagation to a fixpoint. Every node starts
labeled with itself; each round, a node's label becomes the min of its
own and its neighbors' labels; at convergence every node carries the
smallest id in its component (which doubles as the canonical keeper —
the same keep-lowest-id rule the exact-dedup path uses). Rounds needed
= graph diameter; dedup graphs are overwhelmingly tiny cliques/chains
(diameter ≤ ~3), so the loop terminates in a handful of rounds. The
fixpoint is unique regardless of execution order, so the result is
deterministic and a DuckDB recursive-CTE oracle reaches the identical
answer (q_dedup_groups).

Scale shape: each round is one join of (src, dst) edges against
(node, lbl) labels — both skinny bigint pairs — plus a min-agg on
node; map-side combine applies, nothing wide ever shuffles. The
convergence probe is a LIMIT-1 existence check, not a collect. Driver
round-trips are O(diameter). For graphs with genuinely large
diameters, swap the propagation step for large-star/small-star
(Kiveris et al.) — the per-round plan shape (skinny join + min-agg)
is unchanged; propagation is the right default for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id reachable from it.

    Raises if the fixpoint is not reached within ``max_iter`` rounds
    (diameter larger than expected) rather than returning a partially
    propagated — i.e. wrong — labeling.
    """
    e = edges.select(
        F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b")
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    prev_ckpt: DataFrame | None = None
    for _ in range(max_iter):
        # min over self and neighbours' current labels
        neigh = (
            und.join(labels.withColumnRenamed("node", "b"), "b")
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        merged = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                "lbl",
                F.least(F.col("lbl"), F.coalesce("nlbl", "lbl")).alias("new_lbl"),
            )
        )
        # materialize once per round: the convergence probe and the
        # next round's labels must see the SAME computed labeling
        merged = merged.localCheckpoint(eager=True)
        # the new round's checkpoint no longer depends on the previous
        # one — release its storage so slow-converging graphs hold at
        # most two rounds of label blocks, not O(rounds)
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = merged
        changed = merged.filter(F.col("new_lbl") != F.col("lbl")).limit(1).count()
        labels = merged.select("node", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds the dedup-workload assumption — raise "
        "max_iter or switch to the large-star/small-star variant"
    )


def pagerank(
    edges: DataFrame,
    src: str,
    dst: str,
    iters: int = 2,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iters`` rounds of PageRank over the
    undirected graph induced by ``edges`` (each edge contributes both
    directions; duplicate edges collapse).

    r_{k+1}(v) = (1−d) + d · Σ_{u∈N(v)} r_k(u) / deg(u), r_0 = 1.

    Determinism contract: the neighbor sum is a fixed-point
    accumulation (each contribution r/deg — itself deterministic
    double division — rounds to 1/SCALE via the shared sign·floor
    term and sums exactly as bigint), so a SQL oracle unrolling the
    same ``iters`` reaches bit-identical ranks regardless of either
    engine's reduction order.

    Scale shape: per round, one join of skinny (a, b) edges against
    (node, rank, deg) — both narrow — and one hash agg on the
    receiving node with map-side combine; the same per-round plan as
    ``connected_components``, and the classic Pregel-on-relations
    formulation. Driver round-trips are O(iters), no collect."""
    from open_energy_data_server_spark.constants import SCALE
    from open_energy_data_server_spark.operators.similarity import fixed_round

    from pyspark import StorageLevel

    e = edges.select(
        F.col(src).cast("bigint").alias("a"), F.col(dst).cast("bigint").alias("b")
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # the edge list feeds every round's join (and deg) — persist it so
    # the upstream edge-derivation pipeline runs once, not O(iters)
    # times (DataFrame lineage has no CTE materialization; without
    # this a 2-iter run re-scans the fact tables ~20×). Skinny bigint
    # pairs, MEMORY_AND_DISK; capped-FIFO registered so repeated calls
    # don't accumulate storage.
    from open_energy_data_server_spark.operators._cache import register_persisted

    und = register_persisted(und.persist(StorageLevel.MEMORY_AND_DISK))
    deg = register_persisted(
        und.groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = deg.select("node", "deg", F.lit(1.0).alias("rank"))
    for _ in range(iters):
        contrib = (
            und.join(
                ranks.select(
                    F.col("node").alias("a"),
                    (F.col("rank") / F.col("deg")).alias("w"),
                ),
                "a",
            )
            .groupBy(F.col("b").alias("node"))
            .agg(
                (F.sum(fixed_round(F.col("w") * SCALE)).cast("double") / SCALE).alias(
                    "insum"
                )
            )
        )
        ranks = deg.join(contrib, "node", "left").select(
            "node",
            "deg",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce("insum", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", "rank")


def dedup_groups(
    pairs: DataFrame, id_a: str = "doc_a", id_b: str = "doc_b"
) -> DataFrame:
    """(doc_id, group_id, is_keeper) from a near-dup pair set: the
    transitive duplicate group of every flagged document, keeper =
    lowest id per group (drop everything with is_keeper = false to
    realize the dedup)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("group_id"),
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )
