"""Exact discrete quantiles, scale-safe (A-family dashboards).

``quantile_disc`` = the smallest data value whose cumulative row count
reaches ``ceil(p·n)`` within its group. The naive form ranks all rows
(or all distinct values) inside a window partitioned by the group key
— with a low-cardinality key (3 return flags) that is a ≤3-task sort
of the whole column, the one hard parallelism ceiling round 1 flagged.

Two-phase exact algorithm here (classic distributed quantile):

1. per-(group, value) counts — a distributed hash agg with map-side
   combine; the heavy shuffle keys on (group, value), never skewed by
   the group key alone;
2. coarse fixed-width value histogram per group (``n_buckets``,
   default 1024) — a second tiny agg (groups × buckets rows),
   collected to the driver as bounded metadata (the same pattern as
   polygon dims / watermark scalars elsewhere in the engine);
3. the driver walks each group's cumulative histogram to find, for
   every requested quantile, THE one bucket containing rank
   ``ceil(p·n)`` and the residual rank inside it;
4. only rows of those target buckets (≈ distinct-values/n_buckets per
   group) are ranked, in a window partitioned by (group, quantile) —
   bounded by bucket width, which shrinks as n_buckets grows.

Exactness: bucket id is monotone non-decreasing in the value, so
bucket-prefix counts + in-bucket cumulative counts reproduce the
global cumulative count; ``ceil(p·n)`` is evaluated with the same
IEEE double arithmetic the SQL oracle uses.
"""

from __future__ import annotations

import math
from collections import deque

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Bounded FIFO of the per-call persisted (group, value) count frames.
# Unpersisting is SAFE for still-referenced plans (the cache entry goes
# away; a re-execution just recomputes the agg), so capping the registry
# bounds executor-memory growth in long-lived sessions instead of
# leaning on LRU block eviction alone.
_PERSISTED: deque[DataFrame] = deque()
_PERSISTED_CAP = 8


def _drop_oldest() -> None:
    """Unpersist the oldest registered cache; a handle bound to a
    stopped SparkSession just drops silently (the deque outlives the
    session in long-lived processes that recreate their session)."""
    df = _PERSISTED.popleft()
    try:
        df.unpersist()
    except Exception:  # noqa: BLE001 — dead-session handle, nothing to free
        pass


def release_quantile_caches() -> int:
    """Unpersist every cached intermediate from prior quantile_disc
    calls; returns how many were released. Plans already returned stay
    valid — they recompute the count agg if executed again."""
    n = 0
    while _PERSISTED:
        _drop_oldest()
        n += 1
    return n


def _count_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int,
    op_name: str,
) -> tuple[DataFrame, dict]:
    """Shared phase 1+2 of the two-phase quantile algorithms:
    persisted per-(group, value) counts (registered in the capped
    cache FIFO), coarse fixed-width bucketing, and the driver-side
    cumulative histogram ``{group: sorted [(bucket, count)]}``.

    Persisted like jaccard_pairs' posting stream: the histogram pass
    (plan-build time) and the final ranking pass share it, so the
    (group, value) agg runs once. MEMORY_AND_DISK — size is the
    distinct-value domain, spillable, LRU-evicted. NULLs are excluded
    like percentile_disc/cont exclude them (otherwise they'd be
    counted into the top bucket — least() skips nulls — inflating
    every rank). No eager unpersist — the returned plan re-reads the
    cache on every execution — but each handle is registered in a
    capped FIFO so repeated calls in one session evict the oldest
    cache instead of accumulating (release_quantile_caches() drops
    them all)."""
    from pyspark import StorageLevel

    cnt = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _PERSISTED.append(cnt)
    while len(_PERSISTED) > _PERSISTED_CAP:
        _drop_oldest()
    mm = cnt.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).collect()[0]
    if mm["lo"] is None:
        raise ValueError(f"{op_name}: no non-null {value_col!r} values")
    lo, hi = float(mm["lo"]), float(mm["hi"])
    width = (hi - lo) / n_buckets or 1.0
    bucket = F.least(
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        F.lit(n_buckets - 1),
    )
    bucketed = cnt.withColumn("__b", bucket)
    hist = bucketed.groupBy(group_col, "__b").agg(F.sum("c").alias("bc")).collect()
    by_group: dict = {}
    for row in hist:
        by_group.setdefault(row[group_col], []).append((row["__b"], row["bc"]))
    for buckets in by_group.values():
        buckets.sort()
    return bucketed, by_group


def _bucket_of(buckets: list, r: int) -> tuple[int, int]:
    """(bucket id, residual rank) of global rank ``r`` in a group's
    sorted cumulative histogram."""
    cum = 0
    for b, bc in buckets:
        if cum + bc >= r:
            return b, r - cum
        cum += bc
    raise AssertionError("rank beyond group count")


def quantile_disc(
    df: DataFrame,
    group_col: str,
    value_col: str,
    picks: list[tuple[float, str]],
    n_buckets: int = 1024,
) -> DataFrame:
    """→ one row per group with a column per (p, alias) in ``picks``."""
    bucketed, by_group = _count_histogram(
        df, group_col, value_col, n_buckets, "quantile_disc"
    )
    targets = []  # (group, bucket, alias, rank_within_bucket)
    for g, buckets in by_group.items():
        n = sum(bc for _, bc in buckets)
        for p, alias in picks:
            r = math.ceil(p * n)  # same IEEE double product the oracle computes
            b, w_in = _bucket_of(buckets, r)
            targets.append((g, b, alias, w_in))

    from open_energy_data_server_spark.io import local_df

    # plan-embedded LocalRelation (a list-based createDataFrame would
    # plan an ExistingRDD re-pickled through a Python worker per run)
    tgt = local_df(
        df.sparkSession,
        targets,
        f"{group_col} {df.schema[group_col].dataType.simpleString()}, "
        "__b int, __alias string, __r bigint",
    )
    sub = bucketed.join(F.broadcast(tgt), [group_col, "__b"])
    w = (
        Window.partitionBy(group_col, "__alias")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hit = (
        sub.withColumn("__cum", F.sum("c").over(w))
        .filter(F.col("__cum") >= F.col("__r"))
        .groupBy(group_col)
        .pivot("__alias", [alias for _, alias in picks])
        .agg(F.min(value_col))
    )
    return hit


def quantile_cont(
    df: DataFrame,
    group_col: str,
    value_col: str,
    picks: list[tuple[float, str]],
    n_buckets: int = 1024,
) -> DataFrame:
    """Exact CONTINUOUS (type-7 / pandas-default interpolated)
    quantiles per group — same two-phase shape as ``quantile_disc``
    (per-(group, value) counts → driver-walked coarse histogram →
    rank only the target buckets), but each quantile resolves TWO
    ranks: with ``h = (n-1)*p``, the result is
    ``v[floor(h)+1] + (h-floor(h)) * (v[floor(h)+2] - v[floor(h)+1])``
    (1-based ranks).

    Determinism: ``h`` is one IEEE double product of exact operands and
    the interpolation is written with the same parenthesization the
    SQL oracle states, so results hash-match cross-engine (the reason
    this exists instead of ``percentile_approx`` — and DuckDB's native
    ``quantile_cont`` is NOT used in the oracle precisely so the
    arithmetic is pinned by our SQL, not an engine built-in).
    """
    from open_energy_data_server_spark.io import local_df

    bucketed, by_group = _count_histogram(
        df, group_col, value_col, n_buckets, "quantile_cont"
    )
    targets = []  # (group, bucket, tag, rank_within_bucket)
    fracs = []  # (group, alias, frac)
    for g, buckets in by_group.items():
        n = sum(bc for _, bc in buckets)
        for p, alias in picks:
            h = (n - 1) * p  # same IEEE product the oracle computes
            r1 = int(math.floor(h)) + 1
            frac = h - math.floor(h)
            r2 = r1 + 1 if (frac > 0.0 and r1 < n) else r1
            b1, w1 = _bucket_of(buckets, r1)
            targets.append((g, b1, alias + " lo", w1))
            b2, w2 = _bucket_of(buckets, r2)
            targets.append((g, b2, alias + " hi", w2))
            fracs.append((g, alias, frac))

    gtype = df.schema[group_col].dataType.simpleString()
    tgt = local_df(
        df.sparkSession, targets, f"{group_col} {gtype}, __b int, __tag string, __r bigint"
    )
    sub = bucketed.join(F.broadcast(tgt), [group_col, "__b"])
    w = (
        Window.partitionBy(group_col, "__tag")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        sub.withColumn("__cum", F.sum("c").over(w))
        .filter(F.col("__cum") >= F.col("__r"))
        .groupBy(group_col, "__tag")
        .agg(F.min(value_col).alias("__v"))
        .withColumn("__alias", F.split("__tag", " ")[0])
        .withColumn("__side", F.split("__tag", " ")[1])
        .groupBy(group_col, "__alias")
        .pivot("__side", ["lo", "hi"])
        .agg(F.first("__v"))
    )
    fr = local_df(df.sparkSession, fracs, f"{group_col} {gtype}, __alias string, __f double")
    interp = picked.join(F.broadcast(fr), [group_col, "__alias"]).withColumn(
        "__q",
        F.col("lo").cast("double")
        + F.col("__f") * (F.col("hi").cast("double") - F.col("lo").cast("double")),
    )
    return (
        interp.groupBy(group_col)
        .pivot("__alias", [alias for _, alias in picks])
        .agg(F.first("__q"))
    )
