"""XLSX extraction (stages/xlsx.py): spreadsheet behaviors the SQL
oracle never exercises — numeric/inline cells, rich-text runs,
shared-string dedup, missing parts."""
import io
import zipfile

import pyarrow as pa

from jesterj_ray.stages.xlsx import (XlsxExtractor, _synth_xlsx,
                                     make_xlsx, xlsx_extract_one)

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"


def test_roundtrip_rows_and_tabs():
    raw = make_xlsx([["a", "b"], ["c"]], sheet_name="S")
    text, names, n = xlsx_extract_one(raw)
    assert text == "a\tb\nc"
    assert names == ["S"]
    assert n == 3


def test_shared_strings_deduplicate():
    raw = make_xlsx([["x", "y"], ["x", "x"]])
    zf = zipfile.ZipFile(io.BytesIO(raw))
    sst = zf.read("xl/sharedStrings.xml").decode()
    assert sst.count("<si>") == 2          # x, y — stored once each
    assert xlsx_extract_one(raw)[0] == "x\ty\nx\tx"


def _mini(sheet_xml: str, sst_xml: str = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml",
                    f'<workbook xmlns="{_NS}"><sheets>'
                    f'<sheet name="W" sheetId="1"/></sheets></workbook>')
        if sst_xml is not None:
            zf.writestr("xl/sharedStrings.xml", sst_xml)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()


def test_numeric_str_and_inline_cells():
    sheet = (f'<worksheet xmlns="{_NS}"><sheetData><row r="1">'
             '<c r="A1"><v>42</v></c>'
             '<c r="B1" t="str"><v>=SUM</v></c>'
             '<c r="C1" t="inlineStr"><is><t>inline</t></is></c>'
             "</row></sheetData></worksheet>")
    text, names, n = xlsx_extract_one(_mini(sheet))
    assert text == "42\t=SUM\tinline"
    assert n == 3


def test_rich_text_runs_concatenate():
    sst = (f'<sst xmlns="{_NS}" count="1" uniqueCount="1">'
           "<si><r><t>bo</t></r><r><t>ld</t></r></si></sst>")
    sheet = (f'<worksheet xmlns="{_NS}"><sheetData><row r="1">'
             '<c r="A1" t="s"><v>0</v></c></row></sheetData>'
             "</worksheet>")
    assert xlsx_extract_one(_mini(sheet, sst))[0] == "bold"


def test_empty_cell_value():
    sheet = (f'<worksheet xmlns="{_NS}"><sheetData><row r="1">'
             '<c r="A1"/><c r="B1"><v>7</v></c></row></sheetData>'
             "</worksheet>")
    assert xlsx_extract_one(_mini(sheet))[0] == "\t7"


def test_batch_entry_point_schema_and_synthesis():
    t = pa.table({"doc_id": pa.array([9], pa.int64()),
                  "text": pa.array(["a b c d e f"], pa.string())})
    out = XlsxExtractor()(_synth_xlsx(t))
    assert out.column_names == ["doc_id", "sheet_name",
                                "text_extracted", "n_cells"]
    assert out["sheet_name"].to_pylist() == ["doc_9"]
    assert out["text_extracted"].to_pylist() == ["a\tb\tc\td\ne\tf"]
    assert out["n_cells"].to_pylist() == [6]
