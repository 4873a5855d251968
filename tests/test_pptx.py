"""PPTX extraction (stages/pptx.py): PresentationML behaviors the SQL
oracle never exercises — a:br breaks, XML escapes, multi-shape slides,
slide-number ordering past 9."""
import io
import zipfile

import pyarrow as pa

from jesterj_ray.stages.pptx import (PptxExtractor, _synth_pptx,
                                     make_pptx, pptx_extract_one)

_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"


def test_roundtrip_paragraphs_and_slides():
    raw = make_pptx([["one two three four", "five six"], ["seven"]])
    text, n = pptx_extract_one(raw)
    assert text == "one two three four\nfive six\nseven"
    assert n == 2


def test_runs_split_and_rejoin_exactly():
    # 7 words -> runs of 3/3/1; later runs carry a leading space
    raw = make_pptx([["a b c d e f g"]], run_words=3)
    root = zipfile.ZipFile(io.BytesIO(raw)).read("ppt/slides/slide1.xml")
    assert root.count(b"<a:r>") == 3
    assert pptx_extract_one(raw)[0] == "a b c d e f g"


def test_xml_escapes_roundtrip():
    raw = make_pptx([["fish & chips <cheap>"]])
    assert pptx_extract_one(raw)[0] == "fish & chips <cheap>"


def _slide(body: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml",
                    f'<p:sld xmlns:a="{_A}" xmlns:p="{_P}">'
                    f"<p:cSld><p:spTree>{body}</p:spTree></p:cSld>"
                    "</p:sld>")
    return buf.getvalue()


def test_br_becomes_newline_within_paragraph():
    body = ("<p:sp><p:txBody><a:p><a:r><a:t>up</a:t></a:r><a:br/>"
            "<a:r><a:t>down</a:t></a:r></a:p></p:txBody></p:sp>")
    assert pptx_extract_one(_slide(body))[0] == "up\ndown"


def test_multiple_shapes_contribute_lines():
    body = ("<p:sp><p:txBody><a:p><a:r><a:t>title</a:t></a:r></a:p>"
            "</p:txBody></p:sp>"
            "<p:sp><p:txBody><a:p><a:r><a:t>body</a:t></a:r></a:p>"
            "</p:txBody></p:sp>")
    assert pptx_extract_one(_slide(body))[0] == "title\nbody"


def test_slide_numeric_order_past_nine():
    # zip namelist order is insertion order; extraction must sort by
    # slide NUMBER (slide10 after slide9, not after slide1)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for num, word in [(10, "ten"), (2, "two"), (9, "nine")]:
            zf.writestr(f"ppt/slides/slide{num}.xml",
                        f'<p:sld xmlns:a="{_A}" xmlns:p="{_P}">'
                        "<p:cSld><p:spTree><p:sp><p:txBody><a:p>"
                        f"<a:r><a:t>{word}</a:t></a:r></a:p>"
                        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
    text, n = pptx_extract_one(buf.getvalue())
    assert text == "two\nnine\nten"
    assert n == 3


def test_batch_entry_point_schema_and_synthesis():
    t = pa.table({"doc_id": pa.array([3], pa.int64()),
                  "text": pa.array(
                      ["a b c d e f g h i j k l m n"], pa.string())})
    out = PptxExtractor()(_synth_pptx(t))
    assert out.column_names == ["doc_id", "text_extracted", "n_slides"]
    # 14 words -> paragraphs of 6/6/2 -> slides of (p1,p2),(p3)
    assert out["text_extracted"].to_pylist() == [
        "a b c d e f\ng h i j k l\nm n"]
    assert out["n_slides"].to_pylist() == [2]
