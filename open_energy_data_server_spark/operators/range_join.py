"""Range (interval) join — `lo <= point < hi` — via bucket expansion.

The reference's query surface needs point-in-interval joins only in
degenerate forms (as-of enrichment, snapshot-at-latest), but a
training-data pipeline meets the general case constantly (event →
validity window, sample → fiscal period). Spark has no native range
join, and the naive formulation is a BroadcastNestedLoopJoin (O(n·m)
comparisons) or, worse, a cartesian shuffle.

The scale path: pick a bucket width, explode every interval into the
buckets it covers (`sequence(floor(lo/w), floor(hi/w))` — an interval
of length L yields ~L/w + 1 rows), tag every point with its single
bucket, equi-join on the bucket id, then apply the exact residual
predicate. The theta join becomes a hash join whose shuffle is linear
in both inputs; each (point, interval) match is produced exactly once
because a point lives in exactly one bucket. Pick `bucket` near the
typical interval length: shorter → more interval duplication, longer
→ more residual-filter waste. Hot buckets (everything in one window)
are ordinary join skew — AQE skew-join or `operators.skew` salting
applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket: int,
) -> DataFrame:
    """Inner join of each point row to every interval row with
    ``lo <= point < hi`` (half-open, the validity-window convention).
    Numeric domains (use epoch seconds for time). Output columns =
    points ⊕ intervals."""
    b = F.lit(int(bucket))
    pts = points.withColumn("__bucket", F.floor(F.col(point_col) / b))
    ivs = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(F.floor(F.col(lo_col) / b), F.floor(F.col(hi_col) / b))),
    )
    return (
        pts.join(ivs, "__bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bucket")
    )
