"""Fuzzy record linkage: edit-distance candidates via deletion
neighborhoods (the FastSS / SymSpell blocking family — public
literature), verified with the JVM built-in Levenshtein.

Reference parity: the reference reconciles entity/series names across
datasets with ad-hoc string normalization
(/root/reference/crawler/entsoe_crawler.py:54-69 strips "illegal
values from a series name"; /root/reference/crawler/ecmwf.py:27 notes
an upstream field spontaneously renamed); this operator is the
scalable generalization — find all near-identical name pairs
mechanically, then keep a mapping table.

Why not a cross join + levenshtein filter: that's |corpus|² distance
computations. Deletion blocking is exact for distance ≤ 1: two
strings within one edit always share a member of
``{s} ∪ one-char-deletions(s)`` —
  equal            → share s itself;
  one substitution → share the deletion at the mismatch position;
  one insert/delete→ the shorter string IS a deletion of the longer.
So candidates come from a hash self-join on the variant key:
|corpus|·(L+1) skinny rows through the exchange, never pairs².

Scale shape: the variant key is the shuffle key (high cardinality —
names × positions), map-side distinct applies before the join, and
the verify step (levenshtein) touches only bucket-mates. Text length
is bounded by the name column, not the document body.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_keys(col: Column) -> Column:
    """array<string> of the value itself plus every one-character
    deletion (index 0 = identity; index i = drop the i-th char,
    1-based). The identical expression exists in ANSI SQL
    (``list_transform(range(0, length+1), ...)``), so oracle engines
    reproduce the same blocking keys bit-for-bit."""
    return F.transform(
        F.sequence(F.lit(0), F.length(col)),
        lambda i: F.when(i == F.lit(0), col).otherwise(
            F.concat(
                F.substr(col, F.lit(1), i - 1),
                F.substr(col, i + 1, F.length(col)),
            )
        ),
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, dist) for every pair of rows whose
    ``name_col`` values are within ``max_dist`` edits (complete for
    max_dist ≤ 1 by the deletion-neighborhood property; for larger
    distances the blocking is a recall-limited prefilter and callers
    should chain neighborhoods — raise rather than silently miss)."""
    if max_dist > 1:
        raise ValueError(
            "deletion-neighborhood blocking is exact only for max_dist <= 1; "
            "chain multi-deletion neighborhoods for larger radii"
        )
    # rename first, explode second — exploding in the same select as
    # the rename trips Spark's lateral-column-alias resolution when the
    # caller's column is already named "name"
    named = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    # Round-10 optimization (guide §2.3 "shuffle keys and metadata
    # instead of payloads" / §8 "decide with small rows"): edit
    # distance is a NAME-level property, so run the whole variant
    # explode → self-join → levenshtein verify over DISTINCT names
    # and only then expand back to id pairs. On a duplicate-heavy
    # corpus (the realistic record-linkage shape — scale10 replicates
    # every name 10×) the variant self-join shrinks from (10n)·(L+1)
    # rows with 100× the bucket collisions down to the n·(L+1) it was
    # at multiplicity 1, and the final id-level DISTINCT — previously
    # a shuffle of the full output-floor pair set — disappears
    # entirely (each id pair is produced exactly once by construction:
    # one name-pair row × one id per side). Measured: scale10 39.1 s →
    # see OPTIMIZATION_r10.md. Name-level work is unchanged at
    # multiplicity 1, so sf0.1 pays only the names-distinct agg.
    names = named.select("name").distinct()
    # array_distinct BEFORE exploding: names with repeated-character
    # runs ("Customer#000000001") emit the same deletion variant once
    # per run position — without the dedup every shared variant
    # multiplies the self-join k² per bucket (measured 14.5 s → ~3 s
    # at sf0.1 on customer names)
    keyed = names.select(
        "name",
        F.explode(F.array_distinct(deletion_keys(F.col("name")))).alias("k"),
    )
    # the variant stream feeds both join sides — persist it so the
    # explode/dedup pipeline runs once (the jaccard_pairs posting-
    # stream precedent; MEMORY_AND_DISK, skinny rows; registered in
    # the capped FIFO so repeated calls don't accumulate storage)
    from pyspark import StorageLevel

    from open_energy_data_server_spark.operators._cache import register_persisted

    keyed = register_persisted(keyed.persist(StorageLevel.MEMORY_AND_DISK))
    a = keyed.select(F.col("name").alias("name_a"), "k")
    # SHUFFLE_HASH hint (round-11, guide §3.1): the planner broadcasts
    # this side because the cached variant stream's pre-materialization
    # estimate sits under the threshold, but the stream is |names|·(L+1)
    # rows (~250k at sf0.1, unbounded at scale) and a broadcast hash
    # relation builds SERIALLY per execution — measured 0.60 s warm vs
    # 0.23 s with a shuffled hash join (2.7×, identical output). The
    # variant key is high-cardinality and uniform, so per-partition
    # build sides stay bounded at any scale — SHJ is also what a
    # planner with true stats would pick; no sort, unlike SMJ.
    b = keyed.select(F.col("name").alias("name_b"), "k").hint("shuffle_hash")
    dist = F.levenshtein("name_a", "name_b").cast("int")
    # verify BEFORE the pair dedup: levenshtein is a cheap codegen'd
    # projection on the joined rows, while distinct is a shuffle —
    # filtering first shrinks the exchange to the true-pair set.
    # name_a <= name_b keeps each unordered name pair once INCLUDING
    # the (n, n) self-pair that carries same-name id pairs.
    npairs = (
        a.join(b, "k")
        .filter(F.col("name_a") <= F.col("name_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
        .distinct()
    )
    # expand the name-pair verdicts back to id pairs: one hash join
    # per side against the skinny (id, name) table. Exactly-once per
    # id pair: a cross-name row (name_a < name_b) yields each (ia, ib)
    # combination once; the self-pair row (name_a = name_b) yields
    # each unordered id pair once via ia < ib. Output rows are then
    # id-ordered with the names swapped alongside — no terminal
    # DISTINCT over the pair set.
    ia = named.select(F.col("id").alias("ia"), F.col("name").alias("name_a"))
    ib = named.select(F.col("id").alias("ib"), F.col("name").alias("name_b"))
    expanded = (
        npairs.join(ia, "name_a")
        .join(ib, "name_b")
        .filter(
            ((F.col("name_a") < F.col("name_b")) & (F.col("ia") != F.col("ib")))
            | ((F.col("name_a") == F.col("name_b")) & (F.col("ia") < F.col("ib")))
        )
    )
    swap = F.col("ia") < F.col("ib")
    return expanded.select(
        F.least("ia", "ib").alias("id_a"),
        F.greatest("ia", "ib").alias("id_b"),
        F.when(swap, F.col("name_a")).otherwise(F.col("name_b")).alias("name_a"),
        F.when(swap, F.col("name_b")).otherwise(F.col("name_a")).alias("name_b"),
        "dist",
    )
