"""Slowly-changing-dimension (Type 2) history — warehouse-core
versioning the reference's catalog upsert (MERGE, K10) stops short
of: instead of overwriting a dimension row in place, every observed
state change becomes a versioned row with a validity interval.

``scd2_history`` turns a raw change stream (one row per observation,
possibly repeating the same state many times) into the canonical SCD2
table: consecutive identical states collapse, each surviving state
gets ``valid_from`` / ``valid_to`` (null = still current) and a dense
per-key ``version``.

Plan shape: ONE exchange on the dimension key serves every step —
the change-detection lag, the interval lead, and the version
row_number are all windows over the same (key, order) partitioning,
so Catalyst plans a single hash partitioning with stacked Window
operators (no re-shuffle between them; verify with
tests/test_scd.py::test_single_exchange). At 100 TB the change
stream is written partitioned by ingest date and bucketed by key, so
the exchange prunes to changed partitions — the classic incremental-
dimension pipeline; nothing in the operator holds more than one key's
rows in a comparator at a time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """SCD Type 2 from a change stream.

    A row opens a new version exactly when any tracked attribute
    differs from the key's previous observation (null-safe, so the
    first observation always opens). ``valid_to`` is the next
    version's ``valid_from``; the open version has ``valid_to`` null
    and ``is_current`` true. ``tiebreak_cols`` totalizes the order
    when ``ts_col`` can repeat within a key (default: the attribute
    columns themselves).
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or attr_cols)
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~state.eqNullSafe(F.lag(state).over(w))
    opened = df.withColumn("_open", changed).filter(F.col("_open")).drop("_open")
    # same partitioning and ordering -> no second exchange, and the
    # lead/version sequence stays total even when ts repeats in a key
    return opened.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        F.row_number().over(w).cast("int").alias("version"),
    )


def scd2_current(history: DataFrame) -> DataFrame:
    """The Type-1 view of an SCD2 table: only the open versions."""
    return history.filter(F.col("is_current"))


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot: the version valid at ``ts`` (a literal
    or Column) — the query SCD2 exists to answer; partition pruning on
    ``valid_from`` date does the work at scale."""
    t = F.lit(ts)
    return history.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Incremental SCD2 maintenance: fold a batch of new observations
    into an existing history (the steady-state load; ``scd2_history``
    is the initial build).

    Contract: an update AT or before its key's open version's
    valid_from is LATE and is dropped (the standard incremental-load
    assumption — route late rows through operators/incremental.py
    policies upstream if they must be kept). The equal-timestamp case
    is deliberate: the open version already asserts the state at that
    instant, and keeping a conflicting batch row would tie-order by
    attribute values, letting the batch displace the open version
    into a zero-width interval and shift the version numbering (a
    same-state batch row at that instant would collapse as a no-op
    anyway, so nothing real is lost). Untouched keys pass through COLUMN-IDENTICAL with
    no recompute; for touched keys the closed versions pass through
    and only the open version + the batch re-run the change collapse,
    with version numbers continuing the key's existing sequence.
    Same-timestamp ties within the batch order by ``tiebreak_cols``
    when given (the re-opened history row carries NULL tiebreaks —
    harmless, since the late-gate guarantees it never ties with a kept
    batch row), else by the attribute values.

    Plan (round-10 restructure, guide §2.4 "two operations keyed the
    same way share one exchange"): the previous formulation evaluated
    the HISTORY lineage five times (semi-join, anti-join, open-filter,
    and twice more through the ``base`` join used for the late gate
    and the version renumbering) — 36 Exchange nodes in
    q_scd2_apply's 118-node plan, i.e. the dimension build re-ran per
    consumer. Now: ONE left join against the (typically broadcast)
    touched-key set tags history rows, splitting them into the
    passthrough and the open set (history evaluated twice — the
    relational minimum for rows that both pass through and feed a
    window); the late gate and the base-version lookup ride the SAME
    key-partitioned exchange as the change-collapse window (per-key
    ``max`` window aggregates over the reopened row instead of two
    joins back to ``base``). The batch side is typically a day's
    changes, so at 100 TB the recompute still touches |changed keys|
    rows, not the dimension. Result-identical by construction
    (tests/test_scd.py pins apply ≡ full rebuild plus the late-drop
    and equal-ts edge cases; plan shape pinned by
    test_apply_plan_exchanges).
    """
    is_cur = F.col("is_current")
    tiebreak_cols = tiebreak_cols or []
    touched = updates.select(*key_cols).distinct().withColumn("__t", F.lit(1))
    marked = history.join(touched, key_cols, "left")
    out_cols = [*key_cols, *attr_cols, "valid_from", "valid_to",
                "is_current", "version"]
    # untouched keys AND closed versions of touched keys pass through
    # column-identical in one evaluation
    passthrough = marked.filter(F.col("__t").isNull() | ~is_cur)
    # the open version re-enters the collapse, tagged with its version
    # so renumbering needs no join-back
    open_rows = marked.filter((F.col("__t") == 1) & is_cur).select(
        *key_cols,
        *attr_cols,
        F.col("valid_from").alias(ts_col),
        *[
            F.lit(None).cast(updates.schema[c].dataType).alias(c)
            for c in tiebreak_cols
        ],
        F.col("version").alias("__base_version"),
    )
    batch = updates.select(*key_cols, *attr_cols, ts_col, *tiebreak_cols,
                           F.lit(None).cast("int").alias("__base_version"))
    allrows = open_rows.unionByName(batch)
    # late-update gate: keep batch rows STRICTLY after the key's open
    # version's valid_from — equality is late (see contract above);
    # keys new to the dimension have no open row -> keep everything.
    # __open_from / __bv are per-key scalars read off the reopened row
    # (the only row carrying __base_version) via unordered windows —
    # same key partitioning as the collapse, so no extra exchange.
    wk = Window.partitionBy(*key_cols)
    reopened_ts = F.max(
        F.when(F.col("__base_version").isNotNull(), F.col(ts_col))
    ).over(wk)
    gated = (
        allrows.withColumn("__open_from", reopened_ts)
        .withColumn("__bv", F.max("__base_version").over(wk))
        .filter(
            F.col("__base_version").isNotNull()
            | F.col("__open_from").isNull()
            | (F.col(ts_col) > F.col("__open_from"))
        )
    )
    # the scd2_history change collapse inline (so __bv rides along):
    # same window order, same null-safe state comparison
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or attr_cols)
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    state = F.struct(*[F.col(c) for c in attr_cols])
    changed = ~state.eqNullSafe(F.lag(state).over(w))
    opened = gated.withColumn("_open", changed).filter(F.col("_open"))
    # continue each key's version sequence: the first recomputed
    # segment IS the old open version (same valid_from) re-closed
    renumbered = opened.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
        (
            F.row_number().over(w) + F.coalesce(F.col("__bv"), F.lit(1)) - 1
        ).cast("int").alias("version"),
    )
    return passthrough.select(*out_cols).unionByName(
        renumbered.select(*out_cols)
    )
