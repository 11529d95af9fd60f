"""Stored-procedure surface (SURVEY U4).

The reference exposes typed-SETOF stored procedures over PostgREST
RPC (/root/reference/docs/source/minimal_walkthrough/
postgrest_stored_procedure.sql:1-31 — national generation capacity
grouped per year/country/tech). The Spark equivalent is a registry of
named SQL templates materialized as catalog views: ``/rpc/<name>``
becomes ``spark.sql(registry[name])`` — same text, same result shape,
optimized by Catalyst like any other query.

Procedures may declare named parameters: PostgREST binds GET query
params to function arguments (``/rpc/f?a=1&b=x`` → ``f(a := 1,
b := 'x')``), so ``register_procedure(name, sql, params=("a", "b"))``
declares a template whose ``{a}``/``{b}`` placeholders are bound from
the request as SQL literals (ints/floats pass through, everything
else is single-quoted with ``''`` escaping — never raw interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_REGISTRY: dict[str, tuple[str, tuple[str, ...]]] = {}


def _sql_literal(value: str) -> str:
    """Render a request-supplied argument as a safe SQL literal."""
    try:
        return str(int(value))
    except ValueError:
        pass
    try:
        return repr(float(value))
    except ValueError:
        pass
    return "'" + value.replace("'", "''") + "'"


def register_procedure(name: str, sql: str, params: tuple[str, ...] = ()) -> None:
    """Register a named SQL procedure (idempotent overwrite). ``sql``
    may contain ``{param}`` placeholders for each declared param."""
    _REGISTRY[name] = (sql, tuple(params))


def list_procedures() -> list[str]:
    return sorted(_REGISTRY)


def procedure_params(name: str) -> tuple[str, ...]:
    """Declared argument names of a registered procedure."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown procedure {name!r}; known: {list_procedures()}")
    return _REGISTRY[name][1]


def call_procedure(
    spark: SparkSession, name: str, args: dict[str, str] | None = None
) -> DataFrame:
    if name not in _REGISTRY:
        raise KeyError(f"unknown procedure {name!r}; known: {list_procedures()}")
    sql, params = _REGISTRY[name]
    args = dict(args or {})
    unknown = sorted(set(args) - set(params))
    if unknown:
        raise ValueError(
            f"procedure {name!r} has no argument(s) {unknown}; declared: "
            f"{sorted(params)}"
        )
    missing = sorted(set(params) - set(args))
    if missing:
        raise ValueError(f"procedure {name!r} missing argument(s) {missing}")
    if params:
        sql = sql.format(**{p: _sql_literal(args[p]) for p in params})
    return spark.sql(sql)


def create_view(spark: SparkSession, name: str) -> None:
    """Materialize the procedure as a temp view (the dashboard-facing
    form — Grafana queries the view like a table). Only zero-argument
    procedures can be views (a view has no binding site)."""
    if procedure_params(name):
        raise ValueError(f"procedure {name!r} takes arguments; cannot be a view")
    call_procedure(spark, name).createOrReplaceTempView(name)
