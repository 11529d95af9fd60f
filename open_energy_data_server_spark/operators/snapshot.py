"""Snapshot tooling for the keyed lake: CDC-style diffs between two
table versions, and order-independent partition fingerprints for
cross-replica integrity checks.

Both are the mechanical answers to "what changed?" / "do the copies
agree?" that an incremental lake (append batches, compaction, SCD
folds) needs after every maintenance operation — and both are pure
relational plans: one co-partitioned full-outer join for the diff,
one map-side-combined hash-agg for the fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.textops import hash60

# modular sum keeps the per-group fingerprint inside BIGINT for any
# realistic group size (~9e9 rows before 64-bit overflow) and stays
# order-independent — the property that makes it comparable across
# replicas with different physical layouts
FP_MOD = 1_000_000_007


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff of two snapshots of a keyed table: one row per
    key present in either side, classified ``added`` / ``removed`` /
    ``changed`` / ``unchanged`` (null-safe column compare).

    Plan: ONE full-outer join on the key — at scale both snapshots
    come out of the same bucketed/partitioned layout, so the join is
    co-partitioned; the classification is a codegen projection.
    Output: key cols + (old_<c>, new_<c> per compare col) + change.
    """
    o = old.select(
        *key_cols, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(1))
    n = new.select(
        *key_cols, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(1))
    joined = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out_cols = [*key_cols]
    for c in compare_cols:
        out_cols += [f"old_{c}", f"new_{c}"]
    return joined.select(*out_cols, change.alias("change"))


def table_fingerprint(
    df: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Order-independent content fingerprint per group: rows hash to
    hash60 of their '|'-joined canonical string, reduced by a modular
    sum — two replicas (different file layouts, different row orders)
    agree iff their contents agree, group by group.

    One map-side-combined hash-agg; the shuffle carries (group,
    partial-sum, partial-count) — never the rows. The per-group
    ``n_rows`` rides along so a collision-improbable mismatch report
    can say which side is missing rows vs holding different values.

    Canonical form: per column, NULL → 'n' and value v → 'v' + v with
    '\\' and '|' escaped, columns '|'-joined — injective, so rows that
    differ only in WHICH column is null (or contain the delimiter)
    fingerprint differently. (A bare concat_ws would silently SKIP
    nulls — (x, NULL) and (NULL, x) would collide.) The SQL twin is
    ``COALESCE('v' || replace(replace(c, '\\', '\\\\'), '|', '\\|'),
    'n')`` joined with '|'."""
    parts = []
    for c in value_cols:
        escaped = F.replace(
            F.replace(F.col(c).cast("string"), F.lit("\\"), F.lit("\\\\")),
            F.lit("|"),
            F.lit("\\|"),
        )
        parts.append(F.coalesce(F.concat(F.lit("v"), escaped), F.lit("n")))
    canon = F.concat_ws("|", *parts)
    h = hash60(canon) % F.lit(FP_MOD)
    return (
        df.select(*group_cols, h.alias("__h"))
        .groupBy(*group_cols)
        .agg(
            F.sum("__h").cast("bigint").alias("fingerprint"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
