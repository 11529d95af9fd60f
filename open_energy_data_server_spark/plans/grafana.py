"""Grafana macro expansion (SURVEY §3.2).

Grafana dashboards ship rawSql with client-side macros
(/root/reference/data/provisioning/grafana/dashboards/*.json):
``$__timeFilter(ts)``, ``$__timeGroup(ts, $__interval)``,
``$__timeGroupAlias(ts, $__interval)``, ``$__interval``. The
reference's Postgres receives the expanded text; this module performs
the same expansion targeting Spark SQL, so the 13 dashboard rawSql
queries run verbatim against the engine (``time_bucket`` is the
registered SQL function from session.register_engine_functions).
"""

from __future__ import annotations

import re

from open_energy_data_server_spark.functions.timeutil import bucket_width_seconds


def expand_macros(
    sql: str,
    time_from: str,
    time_to: str,
    interval: str = "1 hour",
) -> str:
    """Expand Grafana macros to plain Spark SQL.

    ``time_from``/``time_to``: 'YYYY-MM-DD HH:MM:SS' literals (UTC).
    """
    width = bucket_width_seconds(interval)

    def time_filter(m: re.Match) -> str:
        col = m.group(1).strip()
        return (
            f"{col} BETWEEN TIMESTAMP '{time_from}' AND TIMESTAMP '{time_to}'"
        )

    def time_group(m: re.Match, alias: bool) -> str:
        col = m.group(1).strip()
        expr = f"time_bucket({width}, {col})"
        return f"{expr} AS time" if alias else expr

    out = sql
    out = re.sub(r"\$__timeFilter\(([^)]+)\)", time_filter, out)
    out = re.sub(
        r"\$__timeGroupAlias\(([^,]+),[^)]*\)", lambda m: time_group(m, True), out
    )
    out = re.sub(r"\$__timeGroup\(([^,]+),[^)]*\)", lambda m: time_group(m, False), out)
    out = out.replace("$__interval", interval)
    # Postgres double-quoted identifiers → Spark backticks (in PG SQL,
    # double quotes are ALWAYS identifiers — strings use single quotes —
    # so the blanket rewrite is safe for dashboard rawSql)
    out = re.sub(r'"([^"]+)"', r"`\1`", out)
    return out
