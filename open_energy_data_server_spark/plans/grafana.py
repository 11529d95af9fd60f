"""Grafana macro + template-variable expansion (SURVEY §3.2).

Grafana dashboards ship rawSql with client-side macros
(/root/reference/data/provisioning/grafana/dashboards/*.json):
``$__timeFilter(ts)``, ``$__unixEpochFilter(ts)``,
``$__timeGroup(ts, $__interval)``, ``$__timeGroupAlias(ts,
$__interval)``, ``$__interval``, ``$__interval_ms``, plus dashboard
template variables (``$country``, ``$pointkeys``, ``$NUTS3``, …).
The reference's Postgres receives the expanded text; this module
performs the same expansion targeting Spark SQL, so all 61 dashboard
rawSql panels run verbatim against the engine (``time_bucket`` is the
registered SQL function from session.register_engine_functions).

Ordering constraints the round-7 audit surfaced:
``$__interval_ms`` MUST be substituted before ``$__interval`` (a bare
prefix replace turns ``$__interval_ms`` into ``1 hour_ms`` — every
entsog.json flow panel, ``sum(value/$__interval_ms*1000*60*60)``,
breaks); template variables are substituted after the ``$__`` macros
and longest-name-first so ``$nuts_id`` never clips ``$nuts_id3``-style
siblings.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone

from open_energy_data_server_spark.functions.timeutil import bucket_width_seconds

# Grafana interval shorthand ('30s', '10m', '1h', '1d', '1w') — panels
# may embed literal intervals in $__timeGroup; auto-interval always
# arrives via the expand-time `interval` argument.
_SHORTHAND_UNIT = {"ms": None, "s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def _width_seconds(text: str, default_width: int) -> int:
    """Interval text inside a macro call → bucket width in seconds."""
    t = text.strip().strip("'\"")
    if not t or t.startswith("$"):
        return default_width
    m = re.fullmatch(r"(\d+)(ms|[smhdw])", t)
    if m:
        n, unit = int(m.group(1)), m.group(2)
        if unit == "ms":
            return max(1, n // 1000)
        return n * _SHORTHAND_UNIT[unit]
    return bucket_width_seconds(t)


def _epoch_utc(literal: str) -> int:
    """'YYYY-MM-DD HH:MM:SS' (UTC) → unix seconds."""
    dt = datetime.strptime(literal, "%Y-%m-%d %H:%M:%S")
    return int(dt.replace(tzinfo=timezone.utc).timestamp())


def expand_macros(
    sql: str,
    time_from: str,
    time_to: str,
    interval: str = "1 hour",
    variables: dict[str, str] | None = None,
) -> str:
    """Expand Grafana macros + template variables to plain Spark SQL.

    ``time_from``/``time_to``: 'YYYY-MM-DD HH:MM:SS' literals (UTC).
    ``variables``: dashboard template variables by bare name (no
    ``$``); values are spliced verbatim, so multi-value vars arrive
    pre-formatted the way Grafana's sqlstring formatter would emit
    them (``"'DE','AT'"``).
    """
    width = bucket_width_seconds(interval)

    def time_filter(m: re.Match) -> str:
        col = m.group(1).strip()
        return (
            f"{col} BETWEEN TIMESTAMP '{time_from}' AND TIMESTAMP '{time_to}'"
        )

    def unix_epoch_filter(m: re.Match) -> str:
        col = m.group(1).strip()
        return f"{col} >= {_epoch_utc(time_from)} AND {col} <= {_epoch_utc(time_to)}"

    def time_group(m: re.Match, alias: bool) -> str:
        col = m.group(1).strip()
        w = _width_seconds(m.group(2) or "", width)
        expr = f"time_bucket({w}, {col})"
        return f"{expr} AS time" if alias else expr

    # Filter-macro arguments may themselves be calls (Grafana panels
    # pass e.g. ``unix_timestamp(ts)`` or ``to_timestamp(col)``), so
    # the argument pattern tolerates one paren-nesting level instead of
    # clipping at the first ')'.
    _arg = r"((?:[^()]|\([^()]*\))+)"
    out = sql
    out = re.sub(rf"\$__timeFilter\({_arg}\)", time_filter, out)
    out = re.sub(rf"\$__unixEpochFilter\({_arg}\)", unix_epoch_filter, out)
    out = re.sub(
        r"\$__timeGroupAlias\(([^,)]+)(?:,([^)]*))?\)",
        lambda m: time_group(m, True),
        out,
    )
    out = re.sub(
        r"\$__timeGroup\(([^,)]+)(?:,([^)]*))?\)",
        lambda m: time_group(m, False),
        out,
    )
    # _ms before the bare macro — the bare replace would otherwise
    # corrupt it to '<interval>_ms' (broken SQL in every flow panel)
    out = out.replace("$__interval_ms", str(width * 1000))
    out = out.replace("$__interval", interval)
    for name in sorted(variables or {}, key=len, reverse=True):
        val = str(variables[name])
        out = out.replace("${" + name + "}", val)
        out = re.sub(rf"\${re.escape(name)}\b", val.replace("\\", r"\\"), out)
    # TimescaleDB interval-literal form in raw panel SQL
    # (refit.json: time_bucket('1 hour', "DateTime")) → the engine's
    # integer-seconds time_bucket
    out = re.sub(
        r"time_bucket\(\s*'([^']+)'\s*,",
        lambda m: f"time_bucket({_width_seconds(m.group(1), width)},",
        out,
    )
    # Postgres double-quoted identifiers → Spark backticks (in PG SQL,
    # double quotes are ALWAYS identifiers — strings use single quotes —
    # so the blanket rewrite is safe for dashboard rawSql). '""' inside
    # a quoted identifier is PG's escape for a literal '"' (entsoe.json
    # aliases a price column as \"\"\"0\"\"\").
    out = re.sub(
        r'"((?:[^"]|"")+)"',
        lambda m: "`" + m.group(1).replace('""', '"') + "`",
        out,
    )
    return out
