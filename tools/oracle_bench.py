"""Time the ENTIRE oracle suite on DuckDB — the single-node reference
side of bench.py's comparison (same parquet, same result delivery:
fetchall on the final result).

Usage: PYTHONPATH=. python tools/oracle_bench.py [sf_dir]
Prints one JSON line {"metric": "duckdb_oracle_total", "value": sec,
"queries": {name: sec}, "sf": ...}. Same JMH-style discipline as
bench.py: one untimed warm pass, then per-query minimum of three
timed passes.
"""

from __future__ import annotations

import json
import re
import sys
import time

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    import __spark_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = e.oracle_sql()
    for sql in oracles.values():  # warm pass (I/O cache, plan cache)
        con.execute(sql).fetchall()
    times: dict[str, float] = {}
    for _ in range(3):
        for name, sql in oracles.items():
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            if name not in times or dt < times[name]:
                times[name] = dt
    out = {
        "metric": "duckdb_oracle_total",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": {k: round(v, 4) for k, v in sorted(times.items())},
        "sf": sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
