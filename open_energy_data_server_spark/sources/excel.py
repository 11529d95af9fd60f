"""Excel scan (SURVEY S5) — import-gated.

Models ``pd.read_excel`` with sheet selection / skiprows / usecols
(/root/reference/crawler/regelleistung.py:535,
/root/reference/crawler/iwugebaeudetypen.py:44-49,
/root/reference/crawler/jrc-idees.py:56-95). The reference's Excel
inputs are small workbook artifacts → driver-side read →
``createDataFrame``; many-file corpora would move the same openpyxl
call into mapInPandas over binaryFile, like xml_source.read_xml_files.

openpyxl is not in this container — the reader raises a clear
ImportError until it is; the call signature is final.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:
    import openpyxl  # noqa: F401

    HAS_OPENPYXL = True
except ImportError:
    HAS_OPENPYXL = False


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: str | int = 0,
    skiprows: int = 0,
    header: bool = True,
) -> DataFrame:
    if not HAS_OPENPYXL:
        raise ImportError(
            "read_excel requires openpyxl (not installed in this container); "
            "the reader contract is: driver-side openpyxl → createDataFrame"
        )
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet, skiprows=skiprows, header=0 if header else None)
    return spark.createDataFrame(pdf)
