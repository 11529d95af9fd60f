"""SQLite scan (SURVEY S11).

Models the OPSD household-data crawler: download a ``.sqlite`` file,
read whole tables (/root/reference/crawler/opsd.py:37-58).

Driver-side stdlib ``sqlite3`` → ``createDataFrame`` (Arrow path).
SQLite files are single-writer artifacts measured in MBs — a
driver-side read is the right shape; a JDBC parallel read
(``spark.read.jdbc`` with partitionColumn) is the drop-in upgrade if
a source ever ships multi-GB sqlite, and the call signature here
keeps that swap local to this module.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame, SparkSession


def list_tables(path: str) -> list[str]:
    with sqlite3.connect(path) as con:
        rows = con.execute(
            "SELECT name FROM sqlite_master WHERE type='table' ORDER BY name"
        ).fetchall()
    return [r[0] for r in rows]


def read_sqlite_table(
    spark: SparkSession, path: str, table: str, batch_rows: int = 500_000
) -> DataFrame:
    """Read one table; DDL inferred from the cursor description +
    first batch (sqlite is dynamically typed — values win over
    declared affinities, matching pandas' behavior in the reference)."""
    with sqlite3.connect(path) as con:
        cur = con.execute(f'SELECT * FROM "{table}"')  # noqa: S608 — name from sqlite_master
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
    if not rows:
        raise ValueError(f"sqlite table {table!r} is empty — cannot infer schema")
    return spark.createDataFrame(rows, cols)
