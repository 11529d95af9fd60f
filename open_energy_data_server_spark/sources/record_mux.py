"""Embedded-record-type file parsing (SURVEY S4).

Models the EEX result files that multiplex record types (``ST``/
``PR``/``OT``/…) in one file with per-type headers in comment lines
(/root/reference/crawler/eex.py:85-133). Spark shape: one distributed
``spark.read.text`` scan → per-type prefix filter → ``from_csv`` with
that type's schema. The text scan is shared lineage; Catalyst prunes
it per branch, and no driver materialization happens at any width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_record_mux(
    spark: SparkSession,
    path: str,
    type_schemas: dict[str, str],
    sep: str = ";",
    type_field: str = "record_type",
) -> dict[str, DataFrame]:
    """Split a multiplexed file into one DataFrame per record type.

    ``type_schemas`` maps record-type prefix → DDL schema for the
    fields *after* the type tag (e.g. ``{"ST": "name STRING, v DOUBLE"}``).
    Lines whose first field is not a known type (headers, comments)
    are dropped.
    """
    lines = spark.read.text(path)
    out: dict[str, DataFrame] = {}
    for rtype, ddl in type_schemas.items():
        body = lines.filter(F.split("value", sep).getItem(0) == rtype).select(
            F.expr(f"substring(value, {len(rtype) + len(sep) + 1})").alias("payload")
        )
        parsed = body.select(
            F.from_csv("payload", ddl, {"sep": sep}).alias("r")
        ).select(F.lit(rtype).alias(type_field), "r.*")
        out[rtype] = parsed
    return out
