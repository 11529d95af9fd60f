"""Regenerate QUERIES.md from the query registry (run from repo root)."""

from __future__ import annotations

import inspect
from collections import defaultdict

from open_energy_data_server_spark.queries import ORACLES, QUERIES

by_module: dict[str, list[str]] = defaultdict(list)
for name, fn in QUERIES.items():
    mod = inspect.getmodule(fn).__name__.rsplit("open_energy_data_server_spark.", 1)[-1]
    by_module[mod.replace(".", "/") + ".py"].append(name)

n_oracle = sum(1 for n in QUERIES if n in ORACLES)
n_rows_only = len(QUERIES) - n_oracle
lines = [
    "# QUERIES — the conformance surface (auto-generated index)",
    "",
    "One row per registered query (`__spark_entry__.queries()`); all but",
    f"{n_rows_only} have a DuckDB oracle (`oracle_sql()`) — the exceptions are",
    "genuinely non-SQL-expressible operators (marked *rows-only*) where the",
    "driver records the weaker rows+schema check and a property test pins",
    "exactness. Grouped by module. Regenerate with",
    "`python tools/gen_queries_md.py > QUERIES.md`.",
    "",
    "Oracle-strength policy: `q_interpolate_cubic` is the ONE query whose",
    "oracle replays a committed fixture (`tools/gen_cubic_fixture.py`)",
    "instead of recomputing independently — DuckDB has no spline — and it",
    "carries a property test (`tests/test_properties.py`) proving the",
    "spline reproduces exact cubics. Any future fixture-backed oracle MUST",
    "carry the same property-test backing and be listed here; the default",
    "remains an independently-computed DuckDB SQL twin.",
]
for mod in sorted(by_module):
    lines += ["", f"## {mod}", "", "| query | what it verifies |", "|---|---|"]
    for name in sorted(by_module[mod]):
        doc = inspect.getdoc(QUERIES[name]) or ""
        first = " ".join(doc.split("\n\n")[0].split())
        if len(first) > 160:
            first = first[:157] + "..."
        tag = "" if name in ORACLES else " *(rows-only)*"
        lines.append(f"| `{name}`{tag} | {first} |")
lines += ["", "---", f"{len(QUERIES)} queries, {n_oracle} oracles."]
print("\n".join(lines))
