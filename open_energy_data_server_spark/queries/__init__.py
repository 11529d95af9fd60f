"""Query registry — the conformance surface of the engine.

Every operator from SURVEY.md §2 gets at least one named query here,
expressed against the driver's testdata tables, together with the
ANSI-SQL oracle string DuckDB runs on the same parquet files
(__spark_entry__ contract). Registration is decorator-based so each
module stays self-contained.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` is the DuckDB SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator —
    the driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(already registered by {QUERIES[name].__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects
    from open_energy_data_server_spark.queries import (  # noqa: F401
        aggregates,
        analytics,
        api_surface,
        audit,
        geo_windows,
        joins,
        llm_similarity,
        llm_text,
        relational,
        reshape_asof,
        round7,
        round7b,
        round8,
        round8b,
        round8c,
        round8d,
        round8e,
        round8f,
        round8g,
        round8h,
        round9,
        round9b,
        round9c,
        round10,
        round10b,
        scalars,
        search_rank,
        windows,
    )


_load_all()
