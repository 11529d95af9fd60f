"""XML scan (SURVEY S7).

Models ``pd.read_xml`` over the OPEC price feed
(/root/reference/crawler/opec.py:73) and the MaStR utf-16le bulk
export (/root/reference/crawler/mastr.py:106).

stdlib ElementTree, two execution shapes:
- ``read_xml``: driver-side parse for single small documents (the
  OPEC case — one feed, KBs),
- ``read_xml_files``: distributed parse of a *directory* of XML files
  via ``binaryFile`` + mapInPandas (the MaStR case — the bulk export
  is thousands of per-chunk files; each parses independently inside
  an Arrow batch, so the 12.7M-row export never touches the driver).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _extract(root: ET.Element, record_path: str, fields: dict[str, str]) -> list[dict]:
    out = []
    for rec in root.iterfind(record_path):
        row = {}
        for name, spec in fields.items():
            if spec.startswith("@"):
                row[name] = rec.get(spec[1:])
            elif spec == ".":
                row[name] = (rec.text or "").strip()
            else:
                node = rec.find(spec)
                row[name] = None if node is None else (node.text or "").strip()
        out.append(row)
    return out


def read_xml(
    spark: SparkSession,
    path: str,
    record_path: str,
    fields: dict[str, str],
    encoding: str | None = None,
) -> DataFrame:
    """Driver-side parse of one XML document.

    ``fields``: output column → relative xpath ('@attr' for
    attributes, '.' for the record's own text)."""
    with open(path, "rb") as f:
        raw = f.read()
    text = raw.decode(encoding) if encoding else raw
    root = ET.fromstring(text)
    rows = _extract(root, record_path, fields)
    if not rows:
        raise ValueError(f"no records matched {record_path!r} in {path}")
    schema = ", ".join(f"`{c}` STRING" for c in fields)
    return spark.createDataFrame(pd.DataFrame(rows), schema=schema)


def read_xml_files(
    spark: SparkSession,
    glob_path: str,
    record_path: str,
    fields: dict[str, str],
    encoding: str = "utf-8",
) -> DataFrame:
    """Distributed parse of many XML files (one file per task batch)."""
    names = list(fields)
    schema = ", ".join(f"`{c}` STRING" for c in names)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for raw in pdf["content"]:
                root = ET.fromstring(bytes(raw).decode(encoding))
                rows.extend(_extract(root, record_path, fields))
            yield pd.DataFrame(rows, columns=names) if rows else pd.DataFrame(
                {n: pd.Series(dtype=object) for n in names}
            )

    binary = spark.read.format("binaryFile").load(glob_path).select("content")
    return binary.mapInPandas(parse, schema)
