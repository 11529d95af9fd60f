"""Skew-mitigation utilities (SURVEY §4).

The reference's data is structurally skewed — DE dominates every
country-keyed energy dataset. AQE skew-join handling is on globally
(session.py); these helpers cover the cases AQE does not:

- ``salted_groupby``: two-phase aggregation for *high-cardinality
  aggregation state* on skewed keys (AQE splits skewed join/shuffle
  blocks, but a single hot group still lands in one reducer for
  holistic aggregates). Phase 1 aggregates (key, salt) — the hot key
  spreads over ``n_salts`` reducers; phase 2 combines the partials.
  Works for any algebraic aggregate (sum/count/min/max and their
  compositions like avg = sum/count).
- ``salted_broadcast_left``: replicate-broadcast pattern for joining
  a skewed fact against a mid-size dimension that is too big to
  broadcast whole but fine salted (explode the dim ``n_salts``×).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-tolerant aggregation.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs``
    combine the partial columns per key (e.g. partial ``sum(x) AS s``
    → final ``sum(s) AS s``).
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """fact ⟕ dim on ``on`` with the dim replicated per salt so the
    shuffle key (on, salt) splits each hot key n_salts ways."""
    fact_s = fact.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    dim_s = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_s.join(dim_s, [on, "__salt"], "left").drop("__salt")
