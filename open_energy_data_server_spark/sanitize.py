"""Column-name sanitization (SURVEY P5).

The reference makes source column names DB-safe in every crawler
(sanitize_series /root/reference/crawler/entsoe_crawler.py:52-78,
database_friendly /root/reference/crawler/regelleistung.py:168-231,
lowercase maps /root/reference/crawler/entsog.py:93). This is the
shared engine util: deterministic, idempotent, duplicate-safe.

Pure driver-side metadata operation — renames never touch data, so
they are free at any scale (Catalyst projections only).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_UMLAUTS = {"ä": "ae", "ö": "oe", "ü": "ue", "ß": "ss", "é": "e", "è": "e", "á": "a"}


def sanitize_name(name: str) -> str:
    """snake_case a raw source column name.

    ``'Österreich Demand (MW)'`` → ``'oesterreich_demand_mw'``.
    """
    s = name.strip().lower()
    for src, dst in _UMLAUTS.items():
        s = s.replace(src, dst)
    s = re.sub(r"[^0-9a-z]+", "_", s)
    s = re.sub(r"_+", "_", s).strip("_")
    if not s:
        s = "col"
    if s[0].isdigit():
        s = f"c_{s}"
    return s


def sanitize_columns(df: DataFrame, renames: dict[str, str] | None = None) -> DataFrame:
    """Sanitize every column name; ``renames`` applies semantic renames
    first (the reference's ``database_friendly`` rename maps)."""
    renames = renames or {}
    out, seen = [], {}
    for c in df.columns:
        s = sanitize_name(renames.get(c, c))
        n = seen.get(s, 0)
        seen[s] = n + 1
        out.append(s if n == 0 else f"{s}_{n}")
    return df.toDF(*out)
