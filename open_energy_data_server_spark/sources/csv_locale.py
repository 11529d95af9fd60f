"""Locale-aware CSV reading (SURVEY S2/S3).

Models the reference's pandas dialect zoo: ``sep=';'``,
``decimal=','``, ``thousands='.'``, ``na_values=['N.A.']``,
cp1252/latin-1 encodings, ``skiprows`` junk preambles
(/root/reference/crawler/netztransparenz.py:88-98,
/root/reference/crawler/enet.py:69-70,
/root/reference/crawler/ladesaeulenregister.py:43-52,
/root/reference/crawler/frequency.py:50-82 per-year format sniffing).

Spark's CSV source covers sep/encoding/header natively; what it
lacks — skiprows, decimal-comma numerics, multi-marker NA — is layered
on top: skiprows via a line-index filter on ``spark.read.text`` (kept
distributed — no driver materialization), numerics via the
``parse_locale_number`` scalar kit applied post-parse.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_energy_data_server_spark.functions.numeric import (
    DEFAULT_NA_MARKERS,
    parse_locale_number,
)
from open_energy_data_server_spark.sanitize import sanitize_columns


@dataclass(frozen=True)
class CsvDialect:
    """One source's CSV dialect — the per-source reader config table
    (the reference sniffs per year, frequency.py:50-82; here dialects
    are declared data)."""

    sep: str = ";"
    encoding: str = "UTF-8"
    header: bool = True
    skiprows: int = 0
    decimal: str = ","
    thousands: str = "."
    na_markers: tuple[str, ...] = DEFAULT_NA_MARKERS
    numeric_columns: tuple[str, ...] = ()
    sanitize: bool = True
    quote: str = '"'


def read_locale_csv(spark: SparkSession, path: str, dialect: CsvDialect) -> DataFrame:
    """Read a locale-dialect CSV into a normalized DataFrame.

    With ``skiprows`` the file goes through text→from_csv (so the
    preamble filter stays distributed); otherwise straight through the
    native CSV source (full pushdown preserved).
    """
    if dialect.skiprows:
        # zipWithIndex gives true file line numbers (monotonically_
        # increasing_id does not — it jumps between input splits)
        rdd = spark.sparkContext.textFile(path).zipWithIndex()
        lines = (
            spark.createDataFrame(rdd, "value string, _idx long")
            .filter(F.col("_idx") >= dialect.skiprows)
            .filter(F.length(F.trim("value")) > 0)
        )
        header_line = (
            lines.orderBy("_idx").limit(1).collect()[0].value if dialect.header else None
        )
        body = lines.filter(F.col("_idx") > dialect.skiprows) if dialect.header else lines
        names = (
            [c.strip(dialect.quote) for c in header_line.split(dialect.sep)]
            if header_line is not None
            else None
        )
        schema_ddl = ", ".join(f"`{n}` STRING" for n in (names or []))
        df = body.select(
            F.from_csv(
                "value", schema_ddl, {"sep": dialect.sep, "quote": dialect.quote}
            ).alias("r")
        ).select("r.*")
    else:
        df = (
            spark.read.option("sep", dialect.sep)
            .option("encoding", dialect.encoding)
            .option("header", str(dialect.header).lower())
            .option("quote", dialect.quote)
            .csv(path)
        )

    for col in dialect.numeric_columns:
        if col in df.columns:
            df = df.withColumn(
                col,
                parse_locale_number(
                    col,
                    decimal=dialect.decimal,
                    thousands=dialect.thousands,
                    na_markers=dialect.na_markers,
                ),
            )
    if dialect.sanitize:
        df = sanitize_columns(df)
    return df
