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
