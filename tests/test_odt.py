"""ODT extraction (stages/odt.py): OpenDocument behaviors the SQL
oracle never exercises — text:s multi-space expansion, tabs,
line-breaks, headings, deep span nesting, ODF packaging."""
import io
import zipfile

import pyarrow as pa

from jesterj_ray.stages.odt import (OdtExtractor, _synth_odt, make_odt,
                                    odt_extract_one)

_TXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_OFF = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"


def _content(body: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("content.xml",
                    f'<office:document-content xmlns:office="{_OFF}" '
                    f'xmlns:text="{_TXT}"><office:body><office:text>'
                    f"{body}</office:text></office:body>"
                    "</office:document-content>")
    return buf.getvalue()


def test_roundtrip_spans_and_s_elements():
    raw = make_odt(["alpha beta gamma delta", "epsilon"])
    text, n = odt_extract_one(raw)
    assert text == "alpha beta gamma delta\nepsilon"
    assert n == 2
    # synthesis really does encode some separators as <text:s/>
    xml = zipfile.ZipFile(io.BytesIO(raw)).read("content.xml")
    assert b"<text:s/>" in xml and b"<text:span>" in xml


def test_mimetype_part_is_first_and_stored():
    zf = zipfile.ZipFile(io.BytesIO(make_odt(["x"])))
    infos = zf.infolist()
    assert infos[0].filename == "mimetype"
    assert infos[0].compress_type == zipfile.ZIP_STORED
    assert zf.read("mimetype") == \
        b"application/vnd.oasis.opendocument.text"


def test_multi_space_tab_and_linebreak():
    body = ('<text:p>a<text:s text:c="3"/>b<text:tab/>c'
            "<text:line-break/>d</text:p>")
    assert odt_extract_one(_content(body))[0] == "a   b\tc\nd"


def test_heading_and_paragraph_order():
    raw = make_odt(["Title here", "body text"], headings=True)
    xml = zipfile.ZipFile(io.BytesIO(raw)).read("content.xml")
    assert b"<text:h>" in xml
    assert odt_extract_one(raw)[0] == "Title here\nbody text"


def test_nested_spans_keep_tails():
    body = ("<text:p>pre <text:span>out<text:span>in</text:span>"
            "tail</text:span> post</text:p>")
    assert odt_extract_one(_content(body))[0] == "pre outintail post"


def test_whitespace_element_tails_survive():
    # tail text directly after a childless whitespace element
    body = ('<text:p>x<text:s/>y<text:tab/>z</text:p>')
    assert odt_extract_one(_content(body))[0] == "x y\tz"


def test_batch_entry_point_schema_and_synthesis():
    t = pa.table({"doc_id": pa.array([4], pa.int64()),
                  "text": pa.array(
                      ["a b c d e f g h i"], pa.string())})
    out = OdtExtractor()(_synth_odt(t))
    assert out.column_names == ["doc_id", "text_extracted", "n_paras"]
    # 9 words -> paragraphs of 7/2
    assert out["text_extracted"].to_pylist() == ["a b c d e f g\nh i"]
    assert out["n_paras"].to_pylist() == [2]
