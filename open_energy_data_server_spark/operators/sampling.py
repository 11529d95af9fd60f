"""Deterministic sampling & packing for training-data pipelines.

Two ops a 100 TB corpus pipeline runs constantly:

- ``stratified_hash_sample``: per-stratum Bernoulli sampling that is a
  pure projection — keep a row iff its key's 60-bit md5 hash falls
  under ``rate · 2⁶⁰``. No RNG state, no shuffle, rerun-stable (the
  same row set every time, on any engine — ``df.sample()`` is
  seed-and-partitioning dependent and replays nowhere), and the SQL
  oracle reproduces it exactly. Changing a stratum's rate only grows /
  shrinks its sample monotonically (hash thresholds nest), which is
  what incremental dataset curation wants.

- ``pack_by_budget``: assign ordered documents to training batches by
  cumulative token budget — bin id = floor(start_offset / budget)
  where start_offset = cumsum(tokens) − tokens, over a per-stratum
  ordered window. Offset-partitioned packing: a bin's total can
  overshoot the budget by at most its last row (the streaming-writer
  convention, e.g. maxRecordsPerFile), which unlike true greedy
  close-on-overflow packing is a pure prefix-sum — one shuffle on the
  stratum key, no sequential state, SQL-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from open_energy_data_server_spark.operators.textops import hash60

TWO_60 = 1 << 60


def stratified_hash_sample(
    df: DataFrame, key_col: str, rates: dict[str, float], stratum_col: str
) -> DataFrame:
    """Keep each row iff hash60(key) < rate[stratum] · 2⁶⁰. Strata
    missing from ``rates`` are dropped (rate 0)."""
    thresh = F.lit(-1).cast("bigint")
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * TWO_60)).cast("bigint")
        ).otherwise(thresh)
    return df.filter(hash60(F.col(key_col).cast("string")) < thresh)


def pack_by_budget(
    df: DataFrame,
    size_col: str,
    budget: int,
    stratum_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Add ``bin`` (bigint): rows (in ``order_col`` order, per
    ``stratum_col``) go to bin floor(start_offset / budget) — each
    bin's size reaches the budget and overshoots by at most one row;
    an oversized row occupies its own bin(s) boundary rather than
    erroring."""
    keys = [stratum_col] if stratum_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col or size_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(size_col).cast("bigint")).over(w)
    return df.withColumn(
        "bin", F.floor((cum - F.col(size_col).cast("bigint")) / F.lit(int(budget)))
    )


def fixed_size_hash_sample(
    df: DataFrame, key_col: str, k: int, stratum_col: str | None = None
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: the k rows with the
    smallest key hashes (ties broken by the key) — the rerun-stable
    analog of reservoir sampling. Growing k only ADDS rows (prefix
    property), so refreshing a eval set never churns it. One shuffle
    on the stratum; `WindowGroupLimit` keeps k rows per partition
    before the exchange."""
    keys = [stratum_col] if stratum_col else []
    h = hash60(F.col(key_col).cast("string"))
    w = Window.partitionBy(*keys).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def weighted_hash_sample(df: DataFrame, key_col: str, weight_col) -> DataFrame:
    """Per-row-weighted Bernoulli sampling: keep iff hash60(key) <
    weight · 2⁶⁰ (weight in [0, 1] — e.g. a quality score, so higher-
    quality documents survive proportionally more often). Pure
    projection, rerun-stable, monotone in the weight."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.filter(
        hash60(F.col(key_col).cast("string")).cast("double") < w * float(TWO_60)
    )


def mixture_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    tokens_col: str,
    budgets: dict[str, int],
) -> DataFrame:
    """Token-budget mixture construction (the Pile/Dolma-style data
    MIXING step): from each stratum (domain/language/source), take
    documents until the stratum's token budget is filled; strata
    absent from ``budgets`` contribute nothing.

    Selection order within a stratum is the key's 60-bit hash (ties:
    key) — so the mixture is rerun-stable, engine-replayable, and
    *nested*: raising one stratum's budget only ADDS documents to it
    (the prefix property incremental curation wants; a budget change
    never reshuffles what was already selected).

    A document is kept while its cumulative token count BEFORE it is
    below the budget (offset-partitioned convention, same as
    ``pack_by_budget``): the last kept doc may overshoot by at most
    itself — a pure prefix sum, no sequential close-on-overflow state.

    Plan: one shuffle on the stratum key for the ordered prefix-sum
    window; the budget table is a plan-embedded literal. Output keeps
    (key, stratum, tokens, start_offset) so downstream packing can
    reuse the offsets without re-sorting.
    """
    from open_energy_data_server_spark.io import local_df

    bt = local_df(
        df.sparkSession,
        [(s, int(b)) for s, b in sorted(budgets.items())],
        f"{stratum_col} {df.schema[stratum_col].dataType.simpleString()}, __budget bigint",
    )
    h = hash60(F.col(key_col).cast("string"))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(h.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # budget join FIRST: strata absent from ``budgets`` are pruned
    # BEFORE the only shuffle — the per-stratum window is unaffected
    # by dropping other strata, so a 100-language corpus with one
    # budgeted language sorts one language, not a hundred
    offs = df.join(F.broadcast(bt), stratum_col).withColumn(
        "start_offset",
        (F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)).cast("bigint"),
    )
    return (
        offs.filter(F.col("start_offset") < F.col("__budget"))
        .select(key_col, stratum_col, tokens_col, "start_offset")
    )


def shuffle_shards(
    df: DataFrame, key_col: str, n_shards: int
) -> DataFrame:
    """Deterministic global training-shuffle: assign every row to a
    shard by key hash and a stable pseudo-random position within the
    shard — the "shuffle the corpus before writing training shards"
    step, rerun-stable so a resumed export reproduces byte-identical
    shards.

    Plan: shard id is a projection (pmod of the 60-bit md5 hash); the
    only exchange is the per-shard window that numbers positions in
    hash order. No GLOBAL sort — with n_shards sized to the export
    (hundreds to thousands of files at 100 TB), each shard sorts
    independently and in parallel, and downstream `partitionBy(shard)`
    writes land co-located with zero extra movement. Appends with new
    keys permute positions only within the shards they land in.

    Output: original columns + (shard, pos) with pos dense 1..|shard|.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = hash60(F.col(key_col).cast("string"))
    with_shard = df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(int(n_shards))).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("__h").asc(), F.col(key_col).asc()
    )
    return (
        # bigint: at the 100 TB export scale a shard can exceed 2^31
        # rows, and an int cast would silently overflow the position
        with_shard.withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__h")
    )


def hash_split_bounds(
    fractions: dict[str, float | str]
) -> list[tuple[str, int]]:
    """EXACT cumulative split boundaries: (label, upper_bound) per
    non-final label in sorted-label order, with bounds computed in
    rational arithmetic (``Fraction(str(f))``, floor at 2⁶⁰) — never
    float multiplication, whose truncation depends on accumulation
    order and disagrees in the last few ulps with any engine that
    computes the same boundary in decimal arithmetic. Exposed so an
    oracle/twin can embed the IDENTICAL integer literals."""
    from fractions import Fraction

    total = sum(Fraction(str(f)) for f in fractions.values())
    if total != 1:
        raise ValueError(f"fractions must sum to 1, got {total}")
    labels = sorted(fractions)
    acc = Fraction(0)
    bounds: list[tuple[str, int]] = []
    for label in labels[:-1]:
        acc += Fraction(str(fractions[label]))
        bounds.append((label, int(acc * TWO_60)))
    return bounds


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float | str],
    out_col: str = "split",
) -> DataFrame:
    """Deterministic dataset split (train/val/test): each row's split
    label is a pure function of its key hash and the cumulative
    fraction boundaries — rerun-stable, leakage-free (a key can never
    change splits between runs or machines), and a pure projection
    (zero shuffle; the classic alternative, randomSplit, is neither
    stable across reruns nor key-consistent).

    ``fractions`` maps label → fraction (floats or decimal strings);
    they must sum to exactly 1 in rational arithmetic. Labels are
    assigned in sorted-label order over [0, 2⁶⁰) hash space, with
    boundaries from ``hash_split_bounds`` (exact integers — embed the
    same literals in any replaying twin)."""
    bounds = hash_split_bounds(fractions)
    labels = sorted(fractions)
    h = hash60(F.col(key_col).cast("string"))
    expr = None
    for label, bound in bounds:
        cond = h < F.lit(bound).cast("bigint")
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = (
        F.lit(labels[-1]) if expr is None else expr.otherwise(labels[-1])
    )
    return df.withColumn(out_col, expr)
