"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's conformance
surface (one entry per implemented SURVEY §2 operator) for the
driver's DuckDB-oracle comparison at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from open_energy_data_server_spark.queries import ORACLES, QUERIES
from open_energy_data_server_spark.session import register_engine_functions

FLAGSHIP = "q1_pricing_summary"
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's per-round correctness harness checks queries in
# registration order (first N). Rounds 1+2 together produced green
# rows for 76 of 85 names; the 9 below still lack one — the three
# TIMESTAMP_NTZ failures from round 2 (root cause fixed in
# io.load_table) and the six queries added in round 3 — so they go
# first this round, ahead of the already-green ones.
_DRIVER_PRIORITY = [
    "q_timestamp_assembly",
    "q_interpolate_linear",
    "q_rolling_1h_window",
    "q_decontaminate",
    "q_interpolate_cubic",
    "q_pii_scrub",
    "q_domain_stats",
    "q_skew_salted_agg",
    "q_grafana_panel",
]


def _ordered_names() -> list[str]:
    """Priority names first (those lacking a driver correctness row),
    then everything else in module-registration order."""
    seen = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(seen)]
    return seen + rest


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    register_engine_functions(spark)
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            register_engine_functions(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(QUERIES[name]) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only check)."""
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}
