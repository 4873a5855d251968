"""Email extraction (stages/email_extract.py): the parser behaviors
the SQL oracle cannot express — multipart selection, base64 transfer
decoding, RFC 2047 encoded-word headers, missing headers."""
import base64

import pyarrow as pa

from jesterj_ray.stages.email_extract import (EmailExtractor,
                                              extract_email)


def test_multipart_prefers_text_plain():
    raw = (b"Subject: mp\r\n"
           b"Content-Type: multipart/alternative; boundary=XX\r\n\r\n"
           b"--XX\r\nContent-Type: text/html\r\n\r\n"
           b"<b>nope</b>\r\n"
           b"--XX\r\nContent-Type: text/plain\r\n\r\n"
           b"the plain body\r\n"
           b"--XX--\r\n")
    body, h = extract_email(raw)
    assert body.strip() == "the plain body"
    assert h["subject"] == "mp"


def test_base64_and_encoded_word():
    payload = base64.b64encode("héllo wörld".encode()).decode()
    raw = ("Subject: =?utf-8?b?" +
           base64.b64encode("résumé".encode()).decode() + "?=\r\n"
           "Content-Type: text/plain; charset=utf-8\r\n"
           "Content-Transfer-Encoding: base64\r\n\r\n" +
           payload + "\r\n").encode()
    body, h = extract_email(raw)
    assert body == "héllo wörld"
    assert h["subject"] == "résumé"


def test_missing_headers_null():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "raw_email": pa.array(
                      [b"Content-Type: text/plain\r\n\r\nbody only\r\n"],
                      pa.binary())})
    out = EmailExtractor()(t)
    assert out["subject"][0].as_py() is None
    assert out["from_addr"][0].as_py() is None
    assert out["body"][0].as_py().strip() == "body only"


def test_html_only_message_empty_body():
    raw = (b"Subject: h\r\nContent-Type: text/html\r\n\r\n"
           b"<p>x</p>\r\n")
    body, _ = extract_email(raw)
    # no text/plain part -> empty body by contract
    assert body == ""
