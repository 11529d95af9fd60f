"""Stored-procedure surface (SURVEY U4).

The reference exposes typed-SETOF stored procedures over PostgREST
RPC (/root/reference/docs/source/minimal_walkthrough/
postgrest_stored_procedure.sql:1-31 — national generation capacity
grouped per year/country/tech). The Spark equivalent is a registry of
named SQL templates materialized as catalog views: ``/rpc/<name>``
becomes ``spark.sql(registry[name])`` — same text, same result shape,
optimized by Catalyst like any other query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: dict[str, str] = {}


def register_procedure(name: str, sql: str) -> None:
    """Register a named SQL procedure (idempotent overwrite)."""
    _REGISTRY[name] = sql


def list_procedures() -> list[str]:
    return sorted(_REGISTRY)


def call_procedure(spark: SparkSession, name: str) -> DataFrame:
    if name not in _REGISTRY:
        raise KeyError(f"unknown procedure {name!r}; known: {list_procedures()}")
    return spark.sql(_REGISTRY[name])


def create_view(spark: SparkSession, name: str) -> None:
    """Materialize the procedure as a temp view (the dashboard-facing
    form — Grafana queries the view like a table)."""
    call_procedure(spark, name).createOrReplaceTempView(name)
