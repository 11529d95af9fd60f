"""Pure-Python .xlsx codec + Excel source tests.

The fixture writer lays out the OOXML parts (workbook, rels, shared
strings, worksheet XML) by hand with stdlib zipfile, so the parser is
verified against the public format, not against itself.
"""

from __future__ import annotations

import io
import zipfile

import pandas as pd
import pytest

from open_energy_data_server_spark.sources.excel import read_excel, read_excel_files
from open_energy_data_server_spark.sources.xlsx_codec import _col_idx, parse_xlsx

_WB_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
_R_NS = 'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'


def make_xlsx(
    sheets: dict[str, str],
    shared: list[str] | None = None,
    include_rels: bool = True,
    sheet_ids: list[int] | None = None,
) -> bytes:
    """sheets: name → sheetData XML body; shared: shared-string table.
    ``include_rels=False`` + scrambled ``sheet_ids`` model writers that
    omit the workbook rels part (positional-fallback path)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        ids = sheet_ids or [i + 1 for i in range(len(sheets))]
        sheet_tags = "".join(
            f'<sheet name="{name}" sheetId="{ids[i]}" r:id="rId{i + 1}"/>'
            for i, name in enumerate(sheets)
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {_WB_NS} {_R_NS}>'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        if include_rels:
            rels = "".join(
                f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
                f'officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(sheets))
            )
            zf.writestr(
                "xl/_rels/workbook.xml.rels",
                '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
                f'openxmlformats.org/package/2006/relationships">{rels}</Relationships>',
            )
        if shared is not None:
            sis = "".join(f"<si><t>{s}</t></si>" for s in shared)
            zf.writestr(
                "xl/sharedStrings.xml",
                f'<?xml version="1.0"?><sst {_WB_NS} count="{len(shared)}" '
                f'uniqueCount="{len(shared)}">{sis}</sst>',
            )
        for i, body in enumerate(sheets.values()):
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                f'<?xml version="1.0"?><worksheet {_WB_NS}>'
                f"<sheetData>{body}</sheetData></worksheet>",
            )
    return buf.getvalue()


SHEET1 = (
    '<row r="1">'
    '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
    '<c r="C1" t="s"><v>2</v></c></row>'
    '<row r="2">'
    '<c r="A2" t="s"><v>3</v></c><c r="B2"><v>42</v></c>'
    '<c r="C2"><v>1.5</v></c></row>'
    '<row r="3">'
    '<c r="A3" t="inlineStr"><is><t>inline</t></is></c>'
    '<c r="C3" t="b"><v>1</v></c></row>'
)
SHARED = ["name", "count", "ratio", "alpha"]


def test_col_idx():
    assert [_col_idx(r) for r in ("A1", "Z9", "AA3", "BC12")] == [0, 25, 26, 54]


def test_parse_types_headers_and_gaps():
    pdf = parse_xlsx(make_xlsx({"Data": SHEET1}, SHARED))
    assert list(pdf.columns) == ["name", "count", "ratio"]
    assert pdf.loc[0, "name"] == "alpha"
    # gap in the column → pandas upcasts to float with NaN, matching
    # pd.read_excel's behavior for int columns with missing cells
    assert pdf.loc[0, "count"] == 42
    assert pdf.loc[0, "ratio"] == 1.5
    assert pdf.loc[1, "name"] == "inline"
    assert pd.isna(pdf.loc[1, "count"])  # B3 absent
    assert pdf.loc[1, "ratio"] is True  # t="b"


def test_sheet_selection_and_skiprows():
    two = {
        "First": SHEET1,
        "Second": (
            '<row r="1"><c r="A1" t="str"><v>junk</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>0</v></c></row>'
            '<row r="3"><c r="A3"><v>7</v></c></row>'
        ),
    }
    raw = make_xlsx(two, SHARED)
    by_name = parse_xlsx(raw, sheet="Second", skiprows=1)
    by_idx = parse_xlsx(raw, sheet=1, skiprows=1)
    for pdf in (by_name, by_idx):
        assert list(pdf.columns) == ["name"]
        assert pdf.loc[0, "name"] == 7
    with pytest.raises(ValueError, match="no sheet named"):
        parse_xlsx(raw, sheet="Nope")


def test_refless_cell_follows_previous_column():
    """ECMA-376: a <c> without r occupies the column after the previous
    cell — so after a sparse r="C1" cell, the ref-less value lands in D,
    not B (the old len(cells) bug)."""
    body = (
        '<row r="1"><c r="A1"><v>1</v></c><c r="C1"><v>3</v></c>'
        "<c><v>4</v></c></row>"
    )
    pdf = parse_xlsx(make_xlsx({"S": body}), header=False)
    assert list(pdf.iloc[0]) == [1, None, 3, 4]


def test_rels_absent_resolves_positionally_not_by_sheet_id():
    """Without xl/_rels, sheetN.xml is resolved by POSITION among the
    worksheet parts; sheetId (a logical id that survives deletion /
    reorder) must not pick the part file."""
    two = {
        "First": '<row r="1"><c r="A1"><v>10</v></c></row>',
        "Second": '<row r="1"><c r="A1"><v>20</v></c></row>',
    }
    raw = make_xlsx(two, include_rels=False, sheet_ids=[7, 9])
    assert parse_xlsx(raw, sheet="First", header=False).iloc[0, 0] == 10
    assert parse_xlsx(raw, sheet="Second", header=False).iloc[0, 0] == 20
    assert parse_xlsx(raw, sheet=1, header=False).iloc[0, 0] == 20


def test_read_excel_driver_side(spark, tmp_path):
    p = tmp_path / "wb.xlsx"
    p.write_bytes(make_xlsx({"Data": SHEET1}, SHARED))
    df = read_excel(spark, str(p))
    assert df.columns == ["name", "count", "ratio"]
    assert df.count() == 2


def test_read_excel_files_distributed(spark, tmp_path):
    """Many-workbook corpus: one row layout, parsed executor-side with
    per-file lineage — the regelleistung/jrc ingest shape."""
    from pyspark.sql import functions as F

    d = tmp_path / "xl"
    d.mkdir()
    for stem, val in (("jan", 10), ("feb", 20)):
        body = (
            '<row r="1"><c r="A1" t="s"><v>0</v></c>'
            '<c r="B1" t="s"><v>1</v></c></row>'
            f'<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>{val}</v></c></row>'
        )
        (d / f"{stem}.xlsx").write_bytes(
            make_xlsx({"S": body}, ["product", "mw", "balancing"])
        )
    df = read_excel_files(
        spark, str(d) + "/*.xlsx", "product string, mw bigint", with_source=True
    )
    rows = {r.source_file: (r.product, r.mw) for r in df.collect()}
    assert rows == {"jan": ("balancing", 10), "feb": ("balancing", 20)}
    assert df.schema["mw"].dataType.typeName() == "long"
    assert df.filter(F.col("mw") > 15).count() == 1


def test_legacy_xls_handled_by_builtin_codec(spark, tmp_path):
    """The former xlrd gate is gone: .xls routes to the pure-Python
    BIFF8 codec by container magic (full coverage in test_xls.py)."""
    from open_energy_data_server_spark.sources.xls_codec import write_xls

    p = tmp_path / "old.xls"
    p.write_bytes(write_xls({"Data": [["k"], [7]]}))
    assert read_excel(spark, str(p)).collect()[0].k == 7


def test_xlsx_roundtrip_property():
    """Property: random header/value grids survive the OOXML round-trip
    (shared strings for text, numeric cells for numbers, gaps → NaN)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texty = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
    )

    @settings(max_examples=25, deadline=None)
    @given(
        ncols=st.integers(1, 5),
        nrows=st.integers(1, 6),
        data=st.data(),
    )
    def check(ncols, nrows, data):
        headers = [f"c{i}" for i in range(ncols)]
        grid = [
            [
                data.draw(
                    st.one_of(
                        st.none(),
                        st.integers(-10**6, 10**6),
                        texty,
                    )
                )
                for _ in range(ncols)
            ]
            for _ in range(nrows)
        ]
        shared = list(headers)
        for row in grid:
            for v in row:
                if isinstance(v, str) and v not in shared:
                    shared.append(v)
        body = "<row r=\"1\">" + "".join(
            f'<c r="{chr(65 + j)}1" t="s"><v>{shared.index(h)}</v></c>'
            for j, h in enumerate(headers)
        ) + "</row>"
        for i, row in enumerate(grid, start=2):
            cells = []
            for j, v in enumerate(row):
                ref = f"{chr(65 + j)}{i}"
                if v is None:
                    continue
                if isinstance(v, str):
                    cells.append(f'<c r="{ref}" t="s"><v>{shared.index(v)}</v></c>')
                else:
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            body += f'<row r="{i}">' + "".join(cells) + "</row>"
        pdf = parse_xlsx(make_xlsx({"S": body}, shared))
        # all-empty trailing rows/cols are not emitted by the writer, so
        # compare cell-by-cell over the parsed frame's actual extent
        assert list(pdf.columns)[: len(headers)] == headers
        for i in range(len(pdf)):
            for j, h in enumerate(headers):
                want = grid[i][j]
                got = pdf.iloc[i][h] if h in pdf.columns else None
                if want is None:
                    assert got is None or pd.isna(got)
                elif isinstance(want, str):
                    assert got == want
                else:
                    assert got == want

    check()


def test_skiprows_wide_title_row_no_phantom_columns():
    body = (
        '<row r="1">' + "".join(
            f'<c r="{chr(65 + j)}1" t="s"><v>0</v></c>' for j in range(8)
        ) + "</row>"
        '<row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2" t="s"><v>2</v></c></row>'
        '<row r="3"><c r="A3"><v>1</v></c><c r="B3"><v>2</v></c></row>'
    )
    pdf = parse_xlsx(make_xlsx({"S": body}, ["TITLE", "a", "b"]), skiprows=1)
    assert list(pdf.columns) == ["a", "b"]  # no Unnamed: 2..7


def test_read_excel_files_parameterized_type_schema(spark, tmp_path):
    d = tmp_path / "xl2"
    d.mkdir()
    body = (
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>12.34</v></c></row>'
    )
    (d / "w.xlsx").write_bytes(make_xlsx({"S": body}, ["product", "price", "oil"]))
    df = read_excel_files(spark, str(d) + "/*.xlsx", "product string, price decimal(10,2)")
    row = df.collect()[0]
    assert row.product == "oil" and float(row.price) == 12.34
