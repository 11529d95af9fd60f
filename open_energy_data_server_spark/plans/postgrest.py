"""PostgREST query-param grammar → DataFrame translator (SURVEY §3.3).

The reference exposes every table via PostgREST
(/root/reference/compose.yml:37-47); clients query with URL params
(/root/reference/docs/source/examples/http_export_examples.md:8-29):

    ?limit=10&DateTime=gte.2012-01-01
    &select=DateTime,power.sum()&order=DateTime.desc

Grammar covered (the subset the reference's docs/examples use, plus
``in``/``is``/``like``/``not`` from the same spec family):
- filters: ``col=eq.v | neq | gt | gte | lt | lte | like.pat |
  in.(a,b,c) | is.null | not.<op>.v``; logic trees ``or=(...)`` /
  ``and=(...)`` with one nesting level (``or=(and(...),c.eq.v)``)
- ``select``: columns, ``col:alias``, aggregates ``col.sum()/avg()/
  min()/max()/count()`` (aggregates flip the query into a groupBy on
  the plain selected columns — PostgREST's aggregate mode,
  PGRST_DB_AGGREGATES_ENABLED, compose.yml:44-46)
- ``order=col.asc|desc[,col2...]``, ``limit``, ``offset``

Everything compiles to a declarative DataFrame plan — filters and
projections reach the parquet scan via Catalyst pushdown, so a REST
call on a 100 TB table costs one pruned scan, exactly like the SQL
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_COMPARATORS = {
    "eq": lambda c, v: c == v,
    "neq": lambda c, v: c != v,
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "like": lambda c, v: c.like(v.replace("*", "%")),
    "ilike": lambda c, v: F.lower(c).like(v.lower().replace("*", "%")),
}

_AGGS = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max, "count": F.count}

RESERVED = {"select", "order", "limit", "offset", "or", "and"}


def _unquote_value(raw: str) -> str:
    """Strip one pair of surrounding quotes from a filter value. The
    reference's documented export params quote date literals —
    ``DateTime=gte.'2012-01-01'`` (http_export_examples.md:20) — and a
    quoted value compared against a TIMESTAMP column would null-cast
    and silently drop every row."""
    if len(raw) >= 2 and raw[0] == raw[-1] and raw[0] in ("'", '"'):
        return raw[1:-1]
    return raw


def _parse_filter(col: str, spec: str) -> Column:
    c = F.col(col)
    negate = False
    if spec.startswith("not."):
        negate = True
        spec = spec[4:]
    op, _, raw = spec.partition(".")
    if op == "is":
        cond = c.isNull() if raw == "null" else (c == (raw == "true"))
    elif op == "in":
        vals = [_unquote_value(v.strip()) for v in raw.strip("()").split(",")]
        cond = c.cast("string").isin(vals)
    elif op in _COMPARATORS:
        cond = _COMPARATORS[op](c, _unquote_value(raw))
    else:
        raise ValueError(f"unsupported PostgREST operator {op!r} for column {col!r}")
    return ~cond if negate else cond


def _split_top_level(spec: str) -> list[str]:
    """Split on commas outside parentheses (``in.(a,b)`` values keep
    their commas)."""
    out, depth, cur = [], 0, []
    for ch in spec:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _parse_logic(spec: str, disjunct: bool) -> Column:
    """PostgREST logic trees: ``or=(a.gte.1,b.is.null)`` /
    ``and=(...)``, with one level of nesting (``or=(and(...),c.eq.v)``)."""
    body = spec.strip()
    if not (body.startswith("(") and body.endswith(")")):
        raise ValueError(f"logic filter must be parenthesized: {spec!r}")
    cond: Column | None = None
    for item in _split_top_level(body[1:-1]):
        item = item.strip()
        if item.startswith(("and(", "or(")):
            op, _, rest = item.partition("(")
            sub = _parse_logic("(" + rest, disjunct=(op == "or"))
        else:
            col, _, f = item.partition(".")
            sub = _parse_filter(col, f)
        if cond is None:
            cond = sub
        else:
            cond = (cond | sub) if disjunct else (cond & sub)
    if cond is None:
        raise ValueError(f"empty logic filter: {spec!r}")
    return cond


def _parse_select(spec: str) -> tuple[list[tuple[str, str]], list[tuple[str, str, str]]]:
    """→ (plain [(col, alias)], aggs [(col, fn, alias)])."""
    plain: list[tuple[str, str]] = []
    aggs: list[tuple[str, str, str]] = []
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        if item.endswith("()"):
            col, _, fn = item[:-2].rpartition(".")
            aggs.append((col, fn, f"{fn}" if col == "" else f"{col}_{fn}"))
        elif ":" in item:
            col, _, alias = item.partition(":")
            plain.append((col, alias))
        else:
            plain.append((item, item))
    return plain, aggs


def translate(df: DataFrame, params: dict[str, str]) -> DataFrame:
    """Apply a PostgREST param dict to a DataFrame."""
    for col, spec in params.items():
        if col in ("or", "and"):
            df = df.filter(_parse_logic(spec, disjunct=(col == "or")))
        elif col in RESERVED:
            continue
        else:
            df = df.filter(_parse_filter(col, spec))

    select_spec = params.get("select")
    if select_spec:
        plain, aggs = _parse_select(select_spec)
        if aggs:
            agg_cols = []
            for col, fn, alias in aggs:
                if fn not in _AGGS:
                    raise ValueError(f"unsupported aggregate {fn!r}")
                target = F.col(col) if col else F.lit(1)
                agg_cols.append(_AGGS[fn](target).alias(alias))
            df = df.groupBy(*[F.col(c).alias(a) for c, a in plain]).agg(*agg_cols)
        else:
            df = df.select(*[F.col(c).alias(a) for c, a in plain])

    order_spec = params.get("order")
    if order_spec:
        order_cols = []
        for item in order_spec.split(","):
            col, _, direction = item.strip().partition(".")
            order_cols.append(F.col(col).desc() if direction == "desc" else F.col(col).asc())
        df = df.orderBy(*order_cols)

    offset = int(params.get("offset", 0))
    if offset:
        df = df.offset(offset)
    limit = params.get("limit")
    if limit is not None:
        df = df.limit(int(limit))
    return df
