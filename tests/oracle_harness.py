"""Local replica of the driver's DuckDB-oracle comparison.

Mirrors the contract in __spark_entry__: run the Spark query and the
oracle SQL at sf0.01, sort columns by name, compare row count, column
names, and order-insensitive values. Floats must match exactly — the
engine's queries use exact decimal accumulation to guarantee it.
"""

from __future__ import annotations

import math

import duckdb

from open_energy_data_server_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetch_df()


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        if v == int(v) and abs(v) < 1e15:
            return repr(float(v))
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "tolist") and not hasattr(v, "isoformat"):  # numpy array/scalar
        return _canon_cell(v.tolist())
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return repr(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def assert_parity(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    import pandas as pd

    sp = spark_df.toPandas()
    oc = run_oracle(oracle_sql, sf_dir)
    # dtype parity (before the object-canonicalization below): the
    # engines must agree on integer widths etc., not just values —
    # Spark size()/datediff() emit int32 where DuckDB emits int64
    # unless the query casts (queries align to bigint deliberately)
    for c in sp.columns:
        if c in oc.columns:
            assert str(sp[c].dtype) == str(oc[c].dtype), (
                f"{name}: dtype mismatch on {c}: "
                f"spark={sp[c].dtype} oracle={oc[c].dtype}"
            )
    oc = oc.astype(object).where(pd.notna(oc), None)
    sp = sp.astype(object).where(pd.notna(sp), None)

    assert sorted(sp.columns) == sorted(oc.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} oracle={sorted(oc.columns)}"
    )
    assert len(sp) == len(oc), f"{name}: row count spark={len(sp)} oracle={len(oc)}"

    s_rows = _canon_rows(list(sp.columns), sp.itertuples(index=False, name=None))
    o_rows = _canon_rows(list(oc.columns), oc.itertuples(index=False, name=None))
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
