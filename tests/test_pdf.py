"""PDF extraction (stages/pdf.py): parser behaviors the SQL oracle
never exercises — escapes, TJ arrays, hex strings, uncompressed
streams, object-graph walk, quote operator."""
import zlib

import pyarrow as pa

from jesterj_ray.stages.pdf import (PdfExtractor, _extract_text_ops,
                                    _parse_string, _synth_pdf,
                                    make_pdf, pdf_extract_one)


def test_roundtrip_compressed():
    raw = make_pdf(["hello world", "second line"], title="t1")
    text, meta = pdf_extract_one(raw)
    assert text == "hello world\nsecond line"
    assert meta == {"pdf_title": "t1"}


def test_roundtrip_uncompressed():
    raw = make_pdf(["plain text"], compress=False)
    text, meta = pdf_extract_one(raw)
    assert text == "plain text"
    assert meta == {}


def test_valid_pdf_structure():
    raw = make_pdf(["x"], title="y")
    assert raw.startswith(b"%PDF-1.4")
    assert raw.rstrip().endswith(b"%%EOF")
    # xref offsets actually point at their objects
    xref_at = int(raw.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
    assert raw[xref_at:xref_at + 4] == b"xref"
    for line in raw[xref_at:].split(b"\n")[2:8]:
        off = int(line.split(b" ")[0])
        if line.endswith(b"n "):
            assert raw[off:off + 20].split(b" 0 obj")[0].isdigit()


def test_string_escapes():
    raw = make_pdf([r"paren ( and ) and \ back"])
    assert pdf_extract_one(raw)[0] == r"paren ( and ) and \ back"


def test_parse_string_octal_nested_continuation():
    assert _parse_string(rb"(\101\102\60)", 0)[0] == "AB0"
    assert _parse_string(b"(a(nested)b)", 0)[0] == "a(nested)b"
    assert _parse_string(b"(one\\\ntwo)", 0)[0] == "onetwo"
    assert _parse_string(b"(tab\\there)", 0)[0] == "tab\there"


def test_tj_array_and_hex():
    content = b"BT [(ab) -120 (cd)] TJ <30784142> Tj ET"
    assert _extract_text_ops(content) == "abcd" + "0xAB"


def test_quote_operator_moves_then_shows():
    content = b"BT (l1) Tj (l2) ' ET"
    assert _extract_text_ops(content) == "l1\nl2"


def test_td_without_show_emits_no_blank_line():
    content = b"BT /F1 12 Tf 72 720 Td (a) Tj 0 -14 Td 0 -14 Td ET"
    # second Td after a flush with nothing shown: no empty line
    assert _extract_text_ops(content) == "a"


def test_name_tokens_never_parse_as_operators():
    # a font named /Td must not trigger a line break
    content = b"BT /Td 10 Tf (x) Tj (y) Tj ET"
    assert _extract_text_ops(content) == "xy"


def test_stray_stream_not_mistaken_for_text():
    # an extra non-page stream object is ignored by the graph walk
    raw = bytearray(make_pdf(["real"]))
    extra = (b"9 0 obj\n<< /Length 5 >>\nstream\n(zzz)\nendstream\n"
             b"endobj\n")
    at = raw.find(b"xref")
    raw[at:at] = extra
    assert pdf_extract_one(bytes(raw))[0] == "real"


def test_flate_stream_decodes():
    c = zlib.compress(b"BT (deep) Tj ET")
    body = (b"<< /Length " + str(len(c)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + c
            + b"\nendstream")
    from jesterj_ray.stages.pdf import _stream_bytes
    assert _stream_bytes(body) == b"BT (deep) Tj ET"


def test_batch_entry_point_schema_and_synthesis():
    t = pa.table({"doc_id": pa.array([3], pa.int64()),
                  "text": pa.array(
                      ["a b c d e f g h i j k l"], pa.string())})
    out = PdfExtractor()(_synth_pdf(t))
    assert out.column_names == ["doc_id", "text_extracted",
                                "pdf_title"]
    # 12 words -> lines of 10 + 2
    assert out["text_extracted"].to_pylist() == ["a b c d e f g h i j\nk l"]
    assert out["pdf_title"].to_pylist() == ["doc 3"]
