"""DOCX extraction (stages/docx.py): zip/XML behaviors the SQL oracle
never exercises — tabs, breaks, XML escapes, multi-run joins, missing
core part, batch schema."""
import io
import zipfile

import pyarrow as pa

from jesterj_ray.stages.docx import (DocxExtractor, _synth_docx,
                                     docx_extract_one, make_docx)


def test_roundtrip_multi_paragraph_runs():
    raw = make_docx(["one two three four five", "six seven"])
    text, meta = docx_extract_one(raw)
    assert text == "one two three four five\nsix seven"
    assert meta == {}


def test_title_creator_metadata():
    raw = make_docx(["x"], title="T & <Co>", creator="a\"b")
    text, meta = docx_extract_one(raw)
    assert text == "x"
    assert meta == {"dc_title": "T & <Co>", "dc_creator": 'a"b'}


def test_xml_escapes_in_body():
    raw = make_docx(["a < b & c > d"])
    assert docx_extract_one(raw)[0] == "a < b & c > d"


def test_tab_and_break_elements():
    # hand-built document.xml with w:tab and w:br between runs
    doc = ('<?xml version="1.0"?>'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body><w:p>'
           "<w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/>"
           "<w:t>c</w:t></w:r></w:p></w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert docx_extract_one(buf.getvalue())[0] == "a\tb\nc"


def test_missing_core_part_gives_null_metadata():
    doc = ('<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body><w:p><w:r>'
           "<w:t>z</w:t></w:r></w:p></w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    text, meta = docx_extract_one(buf.getvalue())
    assert (text, meta) == ("z", {})


def test_empty_paragraph_is_empty_line():
    raw = make_docx(["a", "", "b"])
    assert docx_extract_one(raw)[0] == "a\n\nb"


def test_run_split_preserves_spacing():
    # runs of 3 words re-attach separating spaces exactly once
    para = "w1 w2 w3 w4 w5 w6 w7"
    assert docx_extract_one(make_docx([para]))[0] == para


def test_batch_entry_point_schema_and_synthesis():
    t = pa.table({"doc_id": pa.array([0, 14], pa.int64()),
                  "text": pa.array(
                      ["a b c d e f g h i j", ""], pa.string())})
    out = DocxExtractor()(_synth_docx(t))
    assert out.column_names == ["doc_id", "text_extracted",
                                "dc_title", "dc_creator"]
    # 10 words -> paragraphs of 8 + 2
    assert out["text_extracted"].to_pylist() == \
        ["a b c d e f g h\ni j", ""]
    assert out["dc_title"].to_pylist() == ["doc 0", "doc 14"]
    assert out["dc_creator"].to_pylist() == ["author0", "author0"]
