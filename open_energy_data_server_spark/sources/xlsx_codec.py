"""Pure-Python .xlsx parser (ECMA-376 / OOXML SpreadsheetML, public).

openpyxl is absent in this container, but an .xlsx file is just a ZIP
of XML parts — stdlib ``zipfile`` + ``xml.etree`` cover the subset the
reference's Excel-fed crawlers use
(/root/reference/crawler/regelleistung.py:535,
crawler/jrc-idees.py:56-95, crawler/scigrid.py:36-44,
crawler/iwugebaeudetypen.py:44-49 — tabular sheets read with
sheet_name / skiprows / header):

- ``xl/workbook.xml`` + its .rels for sheet name → part resolution,
- ``xl/sharedStrings.xml`` (plain and rich-run strings),
- ``xl/worksheets/sheetN.xml`` cells: shared strings (t="s"), inline
  strings (t="inlineStr"), formula-cached strings (t="str"), booleans
  (t="b"), errors (t="e" → None), numbers (int when integral).

NOT implemented: legacy .xls (BIFF), date-style detection (dates stay
as Excel serial numbers — the callers that need them convert
explicitly), encrypted workbooks.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
import zipfile

import pandas as pd

from open_energy_data_server_spark.sources._robust import corrupt_guard

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"


def _col_idx(ref: str) -> int:
    """'A1' → 0, 'BC12' → 54 (cell reference column letters, base-26)."""
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ET.fromstring(raw)
    out = []
    for si in root.iterfind(f"{_NS}si"):
        # plain <t> or rich runs <r><t>; concatenate all text nodes
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_part(zf: zipfile.ZipFile, sheet: str | int) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = list(wb.iterfind(f"{_NS}sheets/{_NS}sheet"))
    if not sheets:
        raise ValueError("workbook has no sheets")
    if isinstance(sheet, int):
        if sheet >= len(sheets):
            raise ValueError(f"sheet index {sheet} out of range ({len(sheets)} sheets)")
        chosen = sheets[sheet]
    else:
        by_name = {s.get("name"): s for s in sheets}
        if sheet not in by_name:
            raise ValueError(f"no sheet named {sheet!r}; have {sorted(by_name)}")
        chosen = by_name[sheet]
    rid = chosen.get(_RID)
    try:
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        for rel in rels.iterfind(f"{_REL_NS}Relationship"):
            if rel.get("Id") == rid:
                # rels targets are workbook-relative ("worksheets/sheet1.xml");
                # some writers emit package-absolute ("/xl/worksheets/...")
                target = rel.get("Target", "").lstrip("/")
                return target if target.startswith("xl/") else f"xl/{target}"
    except KeyError:
        pass
    # rels part absent: fall back POSITIONALLY among the existing
    # worksheet parts (natural-numeric order). sheetId must not be used
    # here — it is a logical workbook id that survives sheet deletion /
    # reordering, so sheet{sheetId}.xml can silently name a different
    # (or missing) part.
    import re

    parts = sorted(
        (n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
    )
    pos = sheets.index(chosen)
    if pos >= len(parts):
        raise ValueError(
            f"cannot resolve worksheet part for sheet {chosen.get('name')!r}: "
            "workbook rels missing and no positional sheetN.xml candidate"
        )
    return parts[pos]


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_node = c.find(f"{_NS}is")
        return "".join(tn.text or "" for tn in is_node.iter(f"{_NS}t")) if is_node is not None else None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    text = v.text
    if t == "s":
        return shared[int(text)]
    if t == "str":
        return text
    if t == "b":
        return text == "1"
    if t == "e":
        return None
    num = float(text)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


@corrupt_guard("xlsx")
def parse_xlsx(
    raw: bytes,
    sheet: str | int = 0,
    skiprows: int = 0,
    header: bool = True,
) -> pd.DataFrame:
    """.xlsx bytes → pandas frame (``pd.read_excel``-shaped subset)."""
    with zipfile.ZipFile(io.BytesIO(raw)) as zf:
        shared = _shared_strings(zf)
        part = _sheet_part(zf, sheet)
        root = ET.fromstring(zf.read(part))

    rows: dict[int, dict[int, object]] = {}
    for row in root.iterfind(f"{_NS}sheetData/{_NS}row"):
        r_idx = int(row.get("r", len(rows) + 1)) - 1
        cells: dict[int, object] = {}
        # per ECMA-376 an unreferenced <c> occupies the column AFTER the
        # previous cell in the row (not len(cells), which mis-places
        # values after a sparse referenced cell like r="C1")
        last_col = -1
        for c in row.iterfind(f"{_NS}c"):
            ref = c.get("r")
            col = _col_idx(ref) if ref else last_col + 1
            cells[col] = _cell_value(c, shared)
            last_col = col
        rows[r_idx] = cells

    if not rows:
        return pd.DataFrame()
    ordered = [rows.get(i, {}) for i in range(skiprows, max(rows) + 1)]
    # width from the KEPT rows only — a wide title row above skiprows
    # must not inject phantom columns (pd.read_excel semantics)
    max_col = max((c for cells in ordered for c in cells), default=-1)
    grid = [[cells.get(j) for j in range(max_col + 1)] for cells in ordered]
    if header:
        if not grid:
            return pd.DataFrame()
        names = [
            str(h) if h is not None else f"Unnamed: {j}"
            for j, h in enumerate(grid[0])
        ]
        return pd.DataFrame(grid[1:], columns=names)
    return pd.DataFrame(grid)
