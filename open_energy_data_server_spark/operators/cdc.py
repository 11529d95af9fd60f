"""CDC change-log materialization (batch form).

A change-data-capture log is rows ``(key…, ts, seq, op, payload…)``
with ``op`` ∈ inserts/updates/deletes; the *current snapshot* is the
latest row per key that isn't a delete tombstone. The reference's
MERGE-upsert catalog path (`/root/reference/init.sql` unique-index
upserts; see `catalog.py:94` for the repo's MERGE) is the special
case with no deletes and no out-of-order arrivals; this operator is
the general replay: full ordering by ``(ts, seq)``, tombstone
semantics, order-independent input.

Scale shape: ONE hash aggregation — ``max_by(struct(row), struct(ts,
seq))`` — so the map side reduces each partition to one candidate row
per key before the shuffle (partial aggregation), and nothing is
sorted. The window-function formulation (`row_number() … rn = 1`)
shuffles and SORTS every change row; at 100 TB of change log the
max_by form moves |keys| rows, the window form moves |changes| and
sorts them. The streaming twin (`streaming/cdc.py`) folds the same
comparison into per-key state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cdc_current_snapshot(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    delete_ops: Sequence[str] = ("D",),
    keep_deleted: bool = False,
) -> DataFrame:
    """Materialize the current state of a CDC change log: per key the
    row with the greatest ``(ts, seq)`` — ``seq`` breaks same-
    timestamp ties, e.g. a transaction LSN — dropped when that final
    op is a delete (unless ``keep_deleted``, which keeps tombstones
    with their payload for downstream GC accounting).

    Output columns: ``key_cols`` then every non-key column of
    ``changes`` (including ``op_col`` — callers see what the final
    operation was)."""
    keys = list(key_cols)
    others = [c for c in changes.columns if c not in keys]
    cur = (
        changes.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in others]),
                F.struct(F.col(ts_col), F.col(seq_col)),
            ).alias("_cur")
        )
        .select(*keys, *[F.col(f"_cur.{c}").alias(c) for c in others])
    )
    if keep_deleted:
        return cur
    return cur.where(~F.col(op_col).isin(list(delete_ops)))


def cdc_op_from_event_type(
    event_type: Column | str,
    insert_types: Sequence[str] = ("signup",),
    delete_types: Sequence[str] = ("error",),
) -> Column:
    """Map an application event-type column onto I/U/D ops — the
    adapter the conformance query uses to drive the CDC operators from
    the ``events`` table (signup opens a key, error tombstones it,
    everything else upserts)."""
    col = F.col(event_type) if isinstance(event_type, str) else event_type
    return (
        F.when(col.isin(list(insert_types)), F.lit("I"))
        .when(col.isin(list(delete_types)), F.lit("D"))
        .otherwise(F.lit("U"))
    )
