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

Both dispatch on the container magic between the repo's two pure-Python
codecs — OOXML .xlsx (``sources.xlsx_codec``: stdlib zipfile +
ElementTree) and legacy BIFF8 .xls (``sources.xls_codec``: CFB
container + record parser) — so neither openpyxl nor xlrd is needed,
and a mixed directory of both formats scans through one schema.
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
    """Driver-side single-workbook read → DataFrame. Dispatches on the
    container magic: OLE2/CFB → the BIFF8 .xls codec, otherwise the
    OOXML .xlsx codec (both pure-Python; no openpyxl/xlrd needed)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1":
        from open_energy_data_server_spark.sources.xls_codec import parse_xls

        pdf = parse_xls(raw, sheet=sheet, skiprows=skiprows, header=header)
    else:
        pdf = parse_xlsx(raw, sheet=sheet, skiprows=skiprows, header=header)
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
        from open_energy_data_server_spark.sources.xls_codec import parse_xls

        for pdf in batches:
            frames = []
            for path, raw in zip(pdf["path"], pdf["content"]):
                raw = bytes(raw)
                codec = parse_xls if raw[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" else parse_xlsx
                sub = codec(raw, sheet=sheet, skiprows=skiprows, header=header)
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
