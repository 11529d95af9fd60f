"""Excel scan (SURVEY S5).

Models ``pd.read_excel`` with sheet selection / skiprows / header
(/root/reference/crawler/regelleistung.py:535,
/root/reference/crawler/iwugebaeudetypen.py:44-49,
/root/reference/crawler/jrc-idees.py:56-95,
/root/reference/crawler/scigrid.py:36-44).

Two execution shapes, mirroring the XML source:

- ``read_excel``: driver-side read of one workbook → createDataFrame
  (the reference's inputs are small workbook artifacts);
- ``read_excel_files``: distributed scan of a *directory* of .xlsx
  files via binaryFile + mapInPandas with a caller-declared schema —
  each workbook parses independently executor-side (the
  regelleistung/jrc many-file case), nothing passes through the
  driver.

Both use the repo's pure-Python .xlsx codec (``sources.xlsx_codec`` —
stdlib zipfile + ElementTree over the public OOXML format), so no
openpyxl dependency. When pandas+openpyxl IS available it handles
legacy .xls through the same ``read_excel`` signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from open_energy_data_server_spark.sources.xlsx_codec import parse_xlsx

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
    """Driver-side single-workbook read → DataFrame."""
    if path.endswith(".xls"):
        try:
            import xlrd  # noqa: F401  (pandas' .xls engine)
        except ImportError as exc:
            raise ImportError(
                "legacy .xls needs xlrd (pandas' .xls engine); the built-in "
                "pure-Python codec supports only .xlsx"
            ) from exc
        pdf = pd.read_excel(
            path, sheet_name=sheet, skiprows=skiprows, header=0 if header else None
        )
    else:
        with open(path, "rb") as f:
            pdf = parse_xlsx(f.read(), sheet=sheet, skiprows=skiprows, header=header)
        pdf.columns = [str(c) for c in pdf.columns]
    return spark.createDataFrame(pdf)


def read_excel_files(
    spark: SparkSession,
    glob_path: str,
    schema: str,
    sheet: str | int = 0,
    skiprows: int = 0,
    header: bool = True,
    with_source: bool = False,
) -> DataFrame:
    """Distributed parse of many .xlsx files (one per task batch).

    ``schema`` is a Spark DDL string declaring the output columns (a
    distributed read needs the shape up front — the many-file corpora
    this path exists for share one layout). Columns are matched by
    name against the parsed sheet and cast by Arrow on the way out.
    ``with_source=True`` prepends a ``source_file`` column (the file
    stem) for per-file lineage, like the reference keeps per-download
    provenance."""
    ddl = f"source_file string, {schema}" if with_source else schema
    # split the DDL on TOP-LEVEL commas only — commas inside
    # parameterized/nested types (decimal(10,2), array<struct<...>>)
    # are part of the field's type, not separators
    names: list[str] = []
    depth = 0
    field_start = 0
    for i, ch in enumerate(ddl + ","):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append(ddl[field_start:i].split()[0].strip("`"))
            field_start = i + 1

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for path, raw in zip(pdf["path"], pdf["content"]):
                sub = parse_xlsx(bytes(raw), sheet=sheet, skiprows=skiprows, header=header)
                sub.columns = [str(c) for c in sub.columns]
                if with_source:
                    sub.insert(0, "source_file", path.rsplit("/", 1)[-1].rsplit(".", 1)[0])
                missing = [n for n in names if n not in sub.columns]
                for n in missing:
                    sub[n] = None
                frames.append(sub[names])
            yield pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
                {n: pd.Series(dtype=object) for n in names}
            )

    binary = spark.read.format("binaryFile").load(glob_path).select("path", "content")
    return binary.mapInPandas(parse, ddl)
